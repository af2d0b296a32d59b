"""Peak-memory analyzer (reference tools/snapshot_max_memory.py replays
CUDA allocator snapshots; the TPU analogue reads a device memory profile
or live memory stats and reports the peak)."""

import json

import click


def format_bytes(size: float) -> str:
    for unit in ["B", "KB", "MB", "GB", "TB"]:
        if size < 1024:
            return f"{size:.2f} {unit}"
        size /= 1024
    return f"{size:.2f} PB"


@click.command()
@click.option("--profile", type=click.Path(exists=True), default=None,
              help="Optional .prof device-memory profile (jax.profiler."
                   "save_device_memory_profile) — summarized if given.")
def main(profile):
    import jax

    if profile:
        # pprof protobuf: report total sampled bytes without the pprof CLI
        import gzip

        raw = open(profile, "rb").read()
        try:
            raw = gzip.decompress(raw)
        except (OSError, EOFError):
            pass  # not gzip (or truncated): report the raw size
        click.echo(json.dumps({"profile": profile, "bytes": len(raw),
                               "note": "inspect with `pprof` for per-site detail"}))
    for device in jax.local_devices():
        stats = device.memory_stats() or {}
        click.echo(json.dumps({
            "device": str(device),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "peak_human": format_bytes(stats.get("peak_bytes_in_use") or 0),
            "bytes_limit": stats.get("bytes_limit"),
        }))


if __name__ == "__main__":
    main()
