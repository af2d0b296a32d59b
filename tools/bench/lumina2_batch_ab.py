"""Lumina2 batch-scaling A/B: why is batch-4 generate MORE device time
than 4x batch-1?  (BASELINE.md "block-padding effect under
investigation"; r3 window-batching measured 0.79x vs serial.)

Times the jitted CFG denoise step (the pipeline's real
``_denoise_step``) at batch 1/2/4 and reports ms per image, then
isolates the two suspects:

  --no-mask   run with caption_mask all-True (the masked flash path's
              bias rows become no-ops but the kernel shape is the same)
  --xla-attn  VFT_FLASH=0-style fallback is not wired; instead set
              VFT_PACKED_ATTN=0 in the env (classic path) for the
              packed-vs-classic axis.

Usage: python tools/bench/lumina2_batch_ab.py [--res 512] [--steps 6]
           [--cap-len 256] [--no-mask] [--chain] [--profile DIR]
           [--batches 1,2,4]

--chain times a chained window with ONE final fetch (amortizes the
tunnel round trip; separates device compute from dispatch overhead
when compared against the default per-step-fetch timing).
--profile writes a 2-step jax.profiler trace per batch to DIR/b{batch}
(analyze with tools/bench/xplane_stats.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(_REPO, "tools", "bench"))


def main() -> None:
    cache = os.path.join(_REPO, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    res, steps, cap_len = 512, 6, 256
    no_mask = "--no-mask" in sys.argv
    chain = "--chain" in sys.argv
    profile_dir = None
    batches = (1, 2, 4)
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--res":
            res = int(argv[i + 1])
        elif a == "--steps":
            steps = int(argv[i + 1])
        elif a == "--cap-len":
            cap_len = int(argv[i + 1])
        elif a == "--profile":
            profile_dir = argv[i + 1]
        elif a == "--batches":
            batches = tuple(int(x) for x in argv[i + 1].split(","))

    from family_generate import MockHFTokenizer

    from vision_ft_tpu.models.lumina2.config import Lumina2Config
    from vision_ft_tpu.models.lumina2.pipeline import Lumina2

    model = Lumina2(
        Lumina2Config(checkpoint_path="/nonexistent", dtype="bfloat16"),
        tokenizer=MockHFTokenizer(),
    )
    model.init_params(jax.random.PRNGKey(0))
    print("[ab] init done", file=sys.stderr, flush=True)

    feat_dim = model.denoiser.config.caption_dim
    rows = []
    for batch in batches:
        key = jax.random.PRNGKey(batch)
        lat_shape = (
            batch,
            res // int(model.vae.compression_ratio),
            res // int(model.vae.compression_ratio),
            model.denoiser.config.in_channels,
        )
        latents = jax.random.normal(key, lat_shape, jnp.bfloat16)
        feats = jax.random.normal(key, (2 * batch, cap_len, feat_dim), jnp.bfloat16)
        if no_mask:
            mask = jnp.ones((2 * batch, cap_len), bool)
        else:
            # right-padded: 3/4 valid like a typical prompt
            valid = cap_len * 3 // 4
            mask = jnp.concatenate(
                [jnp.ones((2 * batch, valid), bool),
                 jnp.zeros((2 * batch, cap_len - valid), bool)], axis=1
            )
        step = model._get_jit_step(do_cfg=True, use_cache=False)

        def run(lat):
            return step(
                model.params["denoiser"], lat, jnp.float32(800.0),
                jnp.float32(0.9), jnp.float32(0.7), feats, mask, feats,
                jnp.float32(4.0), jnp.float32(1.0),
            )

        # warm up with a SCALAR FETCH, not block_until_ready: through the
        # axon tunnel block_until_ready can early-ack while compile/
        # execution is still in flight, dumping the ~30 s step compile
        # into the first timed window (the r4e "batch-1 pathology" —
        # 600.6 then 3189 ms/step for a step whose true device time is
        # 92 ms). A device->host transfer of a value that depends on the
        # output cannot be faked.
        out = run(latents)
        lat = out[0]
        float(jnp.sum(lat.astype(jnp.float32)))
        out = run(lat)
        lat = out[0]
        float(jnp.sum(lat.astype(jnp.float32)))
        if profile_dir:
            with jax.profiler.trace(os.path.join(profile_dir, f"b{batch}")):
                for _ in range(2):
                    out = run(lat)
                    lat = out[0]
                float(jnp.sum(lat.astype(jnp.float32)))
        if chain:
            # chain all steps through the latents and fetch ONCE: the
            # final scalar depends on every step, so the device must run
            # the full chain, and the tunnel's per-dispatch round trip is
            # amortized over the window instead of paid per step
            t0 = time.perf_counter()
            for _ in range(steps):
                lat = run(lat)[0]
            float(jnp.sum(lat.astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / steps
        else:
            # chain latents between iterations AND fetch a scalar to host
            # each call: block_until_ready alone reported 1-2 ms "steps"
            # through the axon tunnel (early acks); a device->host transfer
            # of the result cannot be faked
            t0 = time.perf_counter()
            for _ in range(steps):
                out = run(lat)
                lat = out[0]
                float(jnp.sum(lat.astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / steps
        per_img = dt / batch * 1000
        rows.append({"batch": batch, "ms_per_step": round(dt * 1000, 1),
                     "ms_per_image": round(per_img, 1)})
        print(f"[ab] batch {batch}: {dt*1000:.1f} ms/step, "
              f"{per_img:.1f} ms/img", file=sys.stderr, flush=True)

    base = rows[0]["ms_per_image"]
    print(json.dumps({
        "metric": f"lumina2_batch_scaling_{res}px" + ("_nomask" if no_mask else ""),
        "value": round(base / rows[-1]["ms_per_image"], 3),
        "unit": "batch4_efficiency_vs_batch1",
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
