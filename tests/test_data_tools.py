"""Offline data tools: styled-image curation + download id listing."""

import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def _post(id_, artist, general="blue_sky 1girl", character="", meta="", parent=None):
    return {
        "id": id_,
        "tag_string_artist": artist,
        "tag_string_copyright": "original",
        "tag_string_character": character,
        "tag_string_general": general,
        "tag_string_meta": meta,
        "parent_id": parent,
    }


def _run(args):
    return subprocess.run([sys.executable, *args], capture_output=True, text=True)


def test_get_styled_images_curation(tmp_path):
    rows = [
        _post(1, "alice"), _post(2, "alice"), _post(3, "alice"),
        _post(4, "alice"), _post(5, "alice"),            # > each_count: newest 4 kept
        _post(10, "bob"), _post(11, "bob"),
        _post(20, "carol"),                               # below min_count -> dropped
        _post(30, "dave duplicate_artist"),               # two artists -> dropped
        _post(40, "erin", meta="variant_set"),            # bad meta -> dropped
        _post(41, "erin", general="comic 1girl"),         # bad general -> dropped
        _post(50, "frank", parent=49), _post(51, "frank"),  # child post dropped -> frank < min_count
        _post(9_000_000, "gus"), _post(9_000_001, "gus"),   # id cap
    ]
    meta_path = str(tmp_path / "meta.parquet")
    out_path = str(tmp_path / "styled.parquet")
    pq.write_table(pa.Table.from_pylist(rows), meta_path)

    res = _run(["tools/data/get_styled_images.py", "--metadata", meta_path,
                "--output", out_path, "--each_count", "4"])
    assert res.returncode == 0, res.stderr
    out = pq.read_table(out_path).to_pylist()

    by_artist: dict[int, list] = {}
    for r in out:
        by_artist.setdefault(r["artist_id"], []).append(r)
    assert len(by_artist) == 2  # alice + bob survive
    sizes = sorted(len(v) for v in by_artist.values())
    assert sizes == [2, 4]
    four = next(v for v in by_artist.values() if len(v) == 4)
    assert sorted(r["id"] for r in four) == [2, 3, 4, 5]  # newest 4 of alice
    sample = out[0]
    assert sample["general"] == ["blue sky"]  # people tags split out, _ de-escaped
    assert sample["people"] == ["1girl"]
    assert set(sample["another_id"]) <= {1, 2, 3, 4, 5, 10, 11}


def test_dl_styled_images_lists_ids_then_gates(tmp_path):
    meta_path = str(tmp_path / "styled.parquet")
    pq.write_table(
        pa.Table.from_pylist([
            {"id": 2, "another_id": [1, 2]},
            {"id": 1, "another_id": [1, 2]},
        ]),
        meta_path,
    )
    res = _run(["tools/data/dl_styled_images.py", "--metadata", meta_path,
                "--images_dir", str(tmp_path / "imgs")])
    assert "Found 2 posts to download." in res.stdout
    assert res.returncode != 0  # cheesechaser gate
    assert "cheesechaser" in res.stderr


def test_downloaders_gate_cleanly(tmp_path):
    for tool, args in [
        ("tools/data/dl_konachan.py", ["--output", str(tmp_path), "--limit", "1"]),
        ("tools/data/dl_safebooru.py", ["--output", str(tmp_path)]),
    ]:
        res = _run([tool, *args])
        assert res.returncode != 0
        assert "cheesechaser" in res.stderr, (tool, res.stderr)
