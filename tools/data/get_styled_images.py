"""Curate a per-artist styled-image metadata parquet from a danbooru-format
metadata parquet (reference tools/data/get_styled_images.py, polars →
pyarrow + plain python since polars is not in this image).

Selection behavior matches the reference: drop duplicate/collaboration/
revision/variant_set/animated meta posts, meme/_challenge/comic/(style)
general tags and child posts; keep single-artist posts with id < 8M;
per artist keep up to --each_count newest posts (artists contributing
fewer than --min_count are dropped); tags split into character/copyright/
general/people/meta lists with underscores de-escaped; people tags are
the ``\\d+(girl|boy|other)s? | no humans`` group. Output columns:
id, artist_id, character, copyright, general, meta, people, another_id
(all ids of the artist). Works entirely offline on a local parquet.
"""

import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)

import re
from collections import defaultdict

import click

# also matches the underscore-escaped raw tag form ("no_humans") — the
# reference applies its pattern before de-escaping and so silently never
# classifies no_humans as a people tag; matching both is strictly better
PEOPLE_PATTERN = re.compile(r"(\d\+?(girl|boy|other)s?|no[ _]humans)")
_BAD_META = ("duplicate", "artist_collaboration", "revision", "variant_set", "animated")
_BAD_GENERAL_SUB = ("_challenge", "comic", "(style)")


def _split_tags(s):
    return [t for t in (s or "").split(" ") if t]


def _clean(tags):
    return [t.replace("_", " ") for t in tags]


@click.command()
@click.option("--metadata", type=str, required=True,
              help="danbooru-format metadata parquet (local path)")
@click.option("--output", type=str, default="./metadata_styled_images.parquet")
@click.option("--each_count", type=int, default=4,
              help="Number of images to select for each artist.")
@click.option("--min_count", type=int, default=2,
              help="Minimum number of images to select for each artist.")
@click.option("--total_count", type=int, default=1000,
              help="Total number of images to select.")
def main(metadata: str, output: str, each_count: int, min_count: int, total_count: int):
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = [
        "id", "tag_string_artist", "tag_string_copyright",
        "tag_string_character", "tag_string_general", "tag_string_meta",
        "parent_id",
    ]
    table = pq.read_table(metadata, columns=cols)
    rows = table.to_pylist()

    kept = []
    seen_characters: dict[str, int] = defaultdict(int)
    for r in rows:
        meta = r.get("tag_string_meta") or ""
        general = r.get("tag_string_general") or ""
        if any(b in meta for b in _BAD_META):
            continue
        if "meme" in _split_tags(general):
            continue
        if any(b in general for b in _BAD_GENERAL_SUB):
            continue
        if r.get("parent_id") is not None:
            continue
        artists = _split_tags(r.get("tag_string_artist") or "")
        if len(artists) != 1:
            continue
        if r["id"] >= 8_000_000:
            continue
        r["artist"] = artists[0]
        kept.append(r)
        seen_characters[r.get("tag_string_character") or ""] += 1

    # unique-or-empty character sets only (no same-character near-duplicates)
    kept = [
        r for r in kept
        if not (r.get("tag_string_character") or "")
        or seen_characters[r["tag_string_character"]] == 1
    ]

    by_artist: dict[str, list] = defaultdict(list)
    for r in sorted(kept, key=lambda r: -r["id"]):  # newest first
        if len(by_artist[r["artist"]]) < each_count:
            by_artist[r["artist"]].append(r)
    by_artist = {a: rs for a, rs in by_artist.items() if len(rs) >= max(min_count, 2)}

    artist_ids = {a: i for i, a in enumerate(sorted(by_artist))}
    out_rows = []
    for artist, rs in by_artist.items():
        ids = [r["id"] for r in rs]
        for r in rs:
            general_tags = _split_tags(r.get("tag_string_general") or "")
            out_rows.append({
                "id": r["id"],
                "artist_id": artist_ids[artist],
                "character": _clean(_split_tags(r.get("tag_string_character") or "")),
                "copyright": _clean(_split_tags(r.get("tag_string_copyright") or "")),
                "general": _clean([t for t in general_tags if not PEOPLE_PATTERN.search(t)]),
                "people": _clean([t for t in general_tags if PEOPLE_PATTERN.search(t)]),
                "meta": _clean(_split_tags(r.get("tag_string_meta") or "")),
                "another_id": ids,
            })
    out_rows.sort(key=lambda r: -r["id"])
    out_rows = out_rows[:total_count]

    pq.write_table(pa.Table.from_pylist(out_rows), output)
    click.echo(f"Wrote {len(out_rows)} rows ({len(by_artist)} artists) to {output}")


if __name__ == "__main__":
    main()
