"""Download safe-rated danbooru posts + metadata json per image (reference
tools/data/dl_safebooru.py). Needs egress + ``cheesechaser``; import-gated
with a clear error (tools/data/README.md). Credentials via
DANBOORU_USERNAME / DANBOORU_API_KEY env vars like the reference.
"""

import json
import os
from pathlib import Path

import click


@click.command()
@click.option("--output", type=str, required=True)
@click.option("--limit", type=int, default=1000)
@click.option("--start-date", type=str, default="2021-01-01")
@click.option("--end-date", type=str, default="2024-8-31")
def main(output: str, limit: int, start_date: str, end_date: str):
    try:
        from cheesechaser.datapool import Danbooru2024WebpDataPool
        from cheesechaser.pipe import SimpleImagePipe
        from cheesechaser.query import DanbooruIdQuery
    except ImportError as e:
        raise click.ClickException(
            "cheesechaser is not installed (and this environment has no "
            "network egress). Install it and rerun, or point the dataset "
            "config at any local folder of images + captions."
        ) from e

    output_dir = Path(output)
    pool = Danbooru2024WebpDataPool()
    post_ids = DanbooruIdQuery(
        [
            "-duplicate",
            "score:>4",
            "filetype:png,jpg,webp",
            "rating:g",
            f"date:{start_date}..{end_date}",
        ],
        username=os.getenv("DANBOORU_USERNAME"),
        api_key=os.getenv("DANBOORU_API_KEY"),
    )
    pipe = SimpleImagePipe(pool)

    posts = {}
    for post in post_ids._iter_items():
        posts[post["id"]] = post
        if len(posts) >= limit:
            break

    (output_dir / "images").mkdir(parents=True, exist_ok=True)
    with pipe.batch_retrieve(posts.keys()) as session:
        for item in session:
            item.data.save(output_dir / "images" / f"{item.id}.webp")
            with open(output_dir / "images" / f"{item.id}.json", "w") as f:
                json.dump(posts[item.id], f, indent=2, ensure_ascii=False)


if __name__ == "__main__":
    main()
