"""Download the newest Konachan webp images (reference
tools/data/dl_konachan.py). Needs network egress + the ``cheesechaser``
package — neither is in this image, so this CLI import-gates with a clear
error; the dataset layer consumes any folder of images (tools/data/README.md).
"""

from pathlib import Path

import click

MAX_ID = 391069


@click.command()
@click.option("--output", "-o", type=str, required=True)
@click.option("--limit", type=int, required=True)
def main(output: str, limit: int):
    try:
        from cheesechaser.datapool import KonachanWebpDataPool
    except ImportError as e:
        raise click.ClickException(
            "cheesechaser is not installed (and this environment has no "
            "network egress). Install it and rerun, or point the dataset "
            "config at any local folder of images."
        ) from e

    output_dir = Path(output) / "images"
    output_dir.mkdir(parents=True, exist_ok=True)
    pool = KonachanWebpDataPool()
    pool.batch_download_to_directory(
        resource_ids=range(max(1, MAX_ID - limit), MAX_ID),
        dst_dir=output_dir.as_posix(),
    )


if __name__ == "__main__":
    main()
