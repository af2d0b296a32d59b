"""Download the images referenced by a styled-images metadata parquet
(reference tools/data/dl_styled_images.py; the parquet comes from
tools/data/get_styled_images.py). The id listing works offline with
pyarrow; the actual download needs egress + ``cheesechaser`` and is
import-gated with a clear error (tools/data/README.md).
"""

from pathlib import Path

import click


@click.command()
@click.option("--metadata", type=str, required=True)
@click.option("--images_dir", type=str, required=True)
@click.option("--debug", is_flag=True, default=False)
def main(metadata: str, images_dir: str, debug: bool):
    import pyarrow.parquet as pq

    images_path = Path(images_dir)
    images_path.mkdir(parents=True, exist_ok=True)

    table = pq.read_table(metadata, columns=["another_id"])
    ids = sorted(
        {i for chunk in table.column("another_id").to_pylist() for i in chunk}
    )
    ids = [i for i in ids if not (images_path / f"{i}.webp").exists()]
    if debug:
        ids = ids[:20]
    click.echo(f"Found {len(ids)} posts to download.")

    try:
        from cheesechaser.datapool import Danbooru2024WebpDataPool
    except ImportError as e:
        raise click.ClickException(
            "cheesechaser is not installed (and this environment has no "
            "network egress); the id listing above is complete — rerun with "
            "cheesechaser installed to fetch."
        ) from e

    pool = Danbooru2024WebpDataPool()
    pool.batch_download_to_directory(resource_ids=ids, dst_dir=str(images_dir))


if __name__ == "__main__":
    main()
