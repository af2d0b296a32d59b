"""Peak-memory report (reference tools/bench/check_memory.py replays CUDA
snapshot pickles; on TPU we read live device memory_stats)."""

import json

import click


@click.command()
def main():
    import jax

    for device in jax.local_devices():
        stats = device.memory_stats() or {}
        click.echo(
            json.dumps(
                {
                    "device": str(device),
                    "bytes_in_use": stats.get("bytes_in_use"),
                    "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                    "bytes_limit": stats.get("bytes_limit"),
                }
            )
        )


if __name__ == "__main__":
    main()
