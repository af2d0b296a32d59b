"""Batched-vs-serial inference-server throughput (tracked config #5).

Measures the core claim of the micro-batched server
(tools/inference_server.py): N concurrent compatible requests cost ~one
batched generate() instead of N serial ones. Uses a random-weight SDXL
at small size/steps (generate timing is value-independent) driven through
the REAL MicroBatcher with N submitter threads, vs the same N requests
issued back-to-back.

Usage: python tools/bench/server_throughput.py [--n 4] [--res 512] [--steps 4]
           [--family sdxl|lumina2]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
for p in (_REPO, os.path.join(_REPO, "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)

import jax
import jax.numpy as jnp


def main() -> None:
    n, res, steps, family = 4, 512, 4, "sdxl"
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--n":
            n = int(argv[i + 1])
        elif a == "--res":
            res = int(argv[i + 1])
        elif a == "--steps":
            steps = int(argv[i + 1])
        elif a == "--family":
            family = argv[i + 1]

    cache_dir = os.path.join(_REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from inference_server import GenerationParams, MicroBatcher
    from vision_ft_tpu.models.sdxl.config import SDXLConfig
    from vision_ft_tpu.models.sdxl.pipeline import SDXLModel

    import numpy as np

    class _HashTok:
        """Deterministic mock CLIP-protocol tokenizer (same pattern as the
        test suite: returns the padded id array directly) — throughput is
        independent of real vocab."""

        bos_token_id, eos_token_id, pad_token_id = 49406, 49407, 0
        model_max_length = 77

        def _ids(self, texts, n):
            if isinstance(texts, str):
                texts = [texts]
            return np.asarray(
                [
                    [self.bos_token_id]
                    + [(abs(hash(t)) + i) % 49000 + 1 for i in range(n - 2)]
                    + [self.eos_token_id]
                    for t in texts
                ]
            )

        def __call__(self, texts, **kw):
            return self._ids(texts, kw.get("max_length", 77))

    if family == "sdxl":
        config = SDXLConfig(checkpoint_path="/nonexistent.safetensors", dtype="bfloat16")
        model = SDXLModel(config, tokenizer=_HashTok())
    elif family == "lumina2":
        from vision_ft_tpu.models.lumina2.config import Lumina2Config
        from vision_ft_tpu.models.lumina2.pipeline import Lumina2

        class _HFTok(_HashTok):
            """HF-call-compatible wrapper (ids+mask dict) for Gemma-2."""

            bos_token_id, eos_token_id, pad_token_id = 1, 2, 0

            def __call__(self, texts, **kw):
                ids = self._ids(texts, kw.get("max_length", 77))

                class R(dict):
                    __getattr__ = dict.__getitem__

                return R(
                    input_ids=ids,
                    attention_mask=np.ones(ids.shape, np.int64),
                )

        model = Lumina2(
            Lumina2Config(checkpoint_path="/nonexistent", dtype="bfloat16"),
            tokenizer=_HFTok(),
        )
    else:
        sys.exit(f"unknown family {family} (sdxl | lumina2)")
    model.init_params(jax.random.PRNGKey(0), jnp.bfloat16)

    class _Server:
        def __init__(self, model):
            self.model = model
            self._lock = threading.Lock()

        def generate_batch(self, batch):
            with self._lock:
                head = batch[0]
                extra = (
                    {"renorm_cfg_scale": head.renorm_cfg,
                     "cfg_truncation_ratio": head.cfg_trunc_ratio}
                    if family == "lumina2" else {}
                )
                return self.model.generate(
                    prompt=[p.prompt for p in batch],
                    negative_prompt=[p.negative_prompt for p in batch],
                    num_inference_steps=head.inference_steps,
                    cfg_scale=head.cfg_scale,
                    width=head.width,
                    height=head.height,
                    **extra,
                )

    server = _Server(model)
    params = [
        GenerationParams(
            prompt=f"a photo of cat {i}", width=res, height=res, inference_steps=steps
        )
        for i in range(n)
    ]

    # warm both compiled shapes (batch 1 and batch n)
    server.generate_batch(params[:1])
    server.generate_batch(params)
    server.generate_batch(params[:1])

    t0 = time.perf_counter()
    for p in params:
        server.generate_batch([p])
    serial = time.perf_counter() - t0

    batcher = MicroBatcher(server, max_batch=n, window_ms=50.0)
    results = {}

    def worker(i):
        results[i] = batcher.submit(params[i])

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    batched = time.perf_counter() - t0
    assert len(results) == n

    print(
        json.dumps(
            {
                "metric": f"server_throughput_speedup_{family}_{n}x{res}px{steps}steps",
                "value": round(serial / batched, 2),
                "unit": "x_vs_serial",
                "serial_s": round(serial, 2),
                "batched_s": round(batched, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
