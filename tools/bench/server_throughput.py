"""Batched-vs-serial inference-server throughput (tracked config #5).

Measures the core claim of the micro-batched server
(tools/inference_server.py): N concurrent compatible requests cost ~one
batched generate() instead of N serial ones. Uses a random-weight SDXL
at small size/steps (generate timing is value-independent) driven through
the REAL MicroBatcher with N submitter threads, vs the same N requests
issued back-to-back.

``--staggered`` instead replays a trace where requests arrive spread out
with MIXED step counts — the regime window collation cannot batch (keys
differ, arrivals miss the window) — through all three schedulers: serial,
window MicroBatcher, and step-level ContinuousBatcher
(vision_ft_tpu.serving). Reports wall time and mean request latency.

Usage: python tools/bench/server_throughput.py [--n 4] [--res 512] [--steps 4]
           [--family sdxl|lumina2] [--staggered] [--gap-ms 300] [--slots 4]

--staggered works for sdxl and lumina2 (the families this harness can
hold resident single-chip; the AuraFlow slot adapter exists but a 6.8B
MMDiT at bf16 exceeds 16 GB HBM — see BASELINE.md).
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
    staggered, gap_ms, slots = False, 300.0, 4
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
        elif a == "--staggered":
            staggered = True
        elif a == "--gap-ms":
            gap_ms = float(argv[i + 1])
        elif a == "--slots":
            slots = int(argv[i + 1])

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

    if staggered:
        _run_staggered(model, family=family, n=n, res=res, gap_ms=gap_ms,
                       slots=slots)
        return

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


def _run_staggered(model, *, family: str, n: int, res: int, gap_ms: float,
                   slots: int) -> None:
    """Replay one staggered mixed-step trace through serial / window /
    continuous scheduling and report wall + mean latency for each."""
    from inference_server import GenerationParams, MicroBatcher
    from vision_ft_tpu.serving import (
        AuraFlowSlotAdapter,
        ContinuousBatcher,
        Lumina2SlotAdapter,
        SDXLSlotAdapter,
        SlotRequest,
    )

    adapter_cls = {
        "sdxl": SDXLSlotAdapter,
        "lumina2": Lumina2SlotAdapter,
        "auraflow": AuraFlowSlotAdapter,
    }.get(family)
    if adapter_cls is None:
        sys.exit(f"--staggered supports sdxl|lumina2|auraflow (got {family})")

    # mixed step counts defeat the window collator's batch key on purpose
    step_mix = [12, 20, 16, 24]
    reqs = [
        GenerationParams(
            prompt=f"a photo of cat {i}", width=res, height=res,
            inference_steps=step_mix[i % len(step_mix)],
        )
        for i in range(n)
    ]

    class _Server:
        def __init__(self, model):
            self.model = model
            self._lock = threading.Lock()

        def generate_batch(self, batch):
            with self._lock:
                head = batch[0]
                return self.model.generate(
                    prompt=[p.prompt for p in batch],
                    negative_prompt=[p.negative_prompt for p in batch],
                    num_inference_steps=head.inference_steps,
                    cfg_scale=head.cfg_scale,
                    width=head.width,
                    height=head.height,
                )

    server = _Server(model)
    for s in sorted(set(step_mix)):  # warm every batch-1 program
        server.generate_batch(
            [GenerationParams(prompt="warm", width=res, height=res,
                              inference_steps=s)]
        )

    def replay(submit):
        """Arrivals every gap_ms; returns (wall_s, mean_latency_s)."""
        lat = [None] * len(reqs)
        threads = []

        def run(i):
            t0 = time.perf_counter()
            submit(reqs[i])
            lat[i] = time.perf_counter() - t0

        t0 = time.perf_counter()
        for i in range(len(reqs)):
            th = threading.Thread(target=run, args=(i,))
            th.start()
            threads.append(th)
            time.sleep(gap_ms / 1000.0)
        for th in threads:
            th.join()
        wall = time.perf_counter() - t0
        assert all(v is not None for v in lat)
        return wall, sum(lat) / len(lat)

    results = {}
    results["serial"] = replay(lambda p: server.generate_batch([p])[0])

    window = MicroBatcher(server, max_batch=slots, window_ms=50.0)
    results["window"] = replay(window.submit)

    adapter = adapter_cls(model, height=res, width=res)
    # +1: SDXL's integer step_ratio walk yields n+1 timesteps for counts
    # that don't divide 1000
    engine = ContinuousBatcher(adapter, num_slots=slots,
                               max_steps=max(step_mix) + 1)
    # warm the pool program + decode
    engine.submit(SlotRequest("warm", num_inference_steps=2))
    try:
        results["continuous"] = replay(
            lambda p: engine.submit(
                SlotRequest(
                    p.prompt, p.negative_prompt,
                    num_inference_steps=p.inference_steps,
                    cfg_scale=p.cfg_scale,
                )
            )
        )
    finally:
        engine.close()

    wall_w, lat_w = results["window"]
    wall_c, lat_c = results["continuous"]
    wall_s, lat_s = results["serial"]
    print(
        json.dumps(
            {
                "metric": f"staggered_continuous_vs_window_{n}x{res}px",
                "value": round(wall_w / wall_c, 2),
                "unit": "x_wall_vs_window",
                "serial": {"wall_s": round(wall_s, 2), "mean_lat_s": round(lat_s, 2)},
                "window": {"wall_s": round(wall_w, 2), "mean_lat_s": round(lat_w, 2)},
                "continuous": {
                    "wall_s": round(wall_c, 2),
                    "mean_lat_s": round(lat_c, 2),
                    "slots": slots,
                },
                "gap_ms": gap_ms,
            }
        )
    )


if __name__ == "__main__":
    main()
