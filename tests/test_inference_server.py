"""Batched inference server: micro-batching collator + HTTP surface.

Reference analogue: tools/inference_server.py (LitServe, one request at a
time). Tracked config #5 names a *batched* server — these tests pin that
concurrent compatible requests coalesce into one generate() call and that
incompatible shapes never share a batch.
"""

import json
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

from PIL import Image

from tools.inference_server import GenerationParams, MicroBatcher, make_handler


class StubModel:
    def __init__(self, delay: float = 0.05):
        self.batches: list[list[GenerationParams]] = []
        self.delay = delay

    def generate_batch(self, batch):
        self.batches.append(list(batch))
        time.sleep(self.delay)  # simulate device time so requests pile up
        return [Image.new("RGB", (p.width, p.height)) for p in batch]


def _submit_many(batcher, params_list):
    results = [None] * len(params_list)
    threads = []

    def run(i, p):
        results[i] = batcher.submit(p)

    for i, p in enumerate(params_list):
        t = threading.Thread(target=run, args=(i, p))
        t.start()
        threads.append(t)
        time.sleep(0.002)
    for t in threads:
        t.join(timeout=10)
    return results


def test_concurrent_compatible_requests_coalesce():
    model = StubModel()
    batcher = MicroBatcher(model, max_batch=4, window_ms=40)
    params = [GenerationParams(prompt=f"p{i}", width=64, height=64) for i in range(8)]
    results = _submit_many(batcher, params)
    assert all(r is not None and r.size == (64, 64) for r in results)
    sizes = sorted(len(b) for b in model.batches)
    assert sum(sizes) == 8
    assert max(sizes) > 1, f"no batching happened: {sizes}"
    assert max(sizes) <= 4


def test_incompatible_shapes_never_share_a_batch():
    model = StubModel()
    # pad_to_bucket off: this test pins the batch-key invariant (padding
    # duplicates the tail request, covered by test_tools.py)
    batcher = MicroBatcher(model, max_batch=8, window_ms=30, pad_to_bucket=False)
    params = [
        GenerationParams(prompt=f"p{i}", width=64 if i % 2 else 128, height=64)
        for i in range(6)
    ]
    results = _submit_many(batcher, params)
    assert all(r is not None for r in results)
    for batch in model.batches:
        keys = {(p.width, p.height, p.inference_steps, p.cfg_scale) for p in batch}
        assert len(keys) == 1
    assert sum(len(b) for b in model.batches) == 6


def test_error_propagates_to_every_request_in_group():
    class Exploding(StubModel):
        def generate_batch(self, batch):
            raise RuntimeError("boom")

    batcher = MicroBatcher(Exploding(), max_batch=4, window_ms=10)
    errors = []

    def run():
        try:
            batcher.submit(GenerationParams(prompt="x", width=64, height=64))
        except RuntimeError as e:
            errors.append(str(e))

    threads = [threading.Thread(target=run) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=5)
    assert errors == ["boom"] * 3


def test_http_round_trip_batches():
    model = StubModel()
    batcher = MicroBatcher(model, max_batch=4, window_ms=40)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(batcher))
    port = server.server_address[1]
    st = threading.Thread(target=server.serve_forever, daemon=True)
    st.start()
    try:
        payload = json.dumps({"prompt": "hi", "width": 64, "height": 64}).encode()

        responses = [None] * 4

        def post(i):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict", data=payload,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=10) as r:
                responses[i] = (r.status, r.headers["Content-Type"], r.read())

        threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10)
        assert all(r is not None for r in responses)
        for status, ctype, data in responses:
            assert status == 200 and ctype == "image/webp" and len(data) > 0
        assert max(len(b) for b in model.batches) > 1  # measured coalescing
        # health endpoint still serves
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=5) as r:
            assert json.loads(r.read())["status"] == "ok"
        # bad payload -> 422
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps({"prompt": "x", "width": 65}).encode(),
        )
        try:
            urllib.request.urlopen(bad, timeout=5)
            assert False, "expected 422"
        except urllib.error.HTTPError as e:
            assert e.code == 422
    finally:
        server.shutdown()


def test_t2imodel_flag_validation(tmp_path):
    """Family/deep-cache combos fail fast, before any checkpoint load."""
    import pytest

    from tools.inference_server import T2IModel

    with pytest.raises(ValueError, match="must be >= 1"):
        T2IModel("does-not-exist.yml", None, None,
                 family="flux", deep_cache_interval=0)

    cfg = tmp_path / "c.yml"
    cfg.write_text(
        "model: {checkpoint_path: ''}\n"
        "dataset: {}\n"
        "optimizer: {name: torch.optim.AdamW, args: {lr: 1.0e-4}}\n"
        "seed: 0\nnum_train_epochs: 1\n"
    )
    with pytest.raises(ValueError, match="unsupported server family"):
        T2IModel(str(cfg), None, None, family="sd3")  # not a family here


def test_family_only_generation_flags():
    """Lumina2-only knobs are rejected for other families (and vice versa)
    before any device work; batch_key separates them so mixed requests
    never share a compiled program."""
    import pytest

    from tools.inference_server import T2IModel, batch_key

    # renorm/trunc reach lumina2's generate; other families refuse them
    sdxl_like = T2IModel.__new__(T2IModel)
    sdxl_like._family = "sdxl"
    sdxl_like._extra = {}
    sdxl_like._lock = threading.Lock()
    calls = {}

    class _M:
        def generate(self, **kw):
            calls.update(kw)
            return [None]

    sdxl_like.model = _M()
    with pytest.raises(ValueError, match="Lumina2-only"):
        sdxl_like.generate_batch(
            [GenerationParams(prompt="x", width=64, height=64, renorm_cfg=2.0)]
        )
    with pytest.raises(ValueError, match="Lumina2-only"):
        sdxl_like.generate_batch(
            [GenerationParams(prompt="x", width=64, height=64, cfg_trunc_ratio=0.25)]
        )

    lum = T2IModel.__new__(T2IModel)
    lum._family = "lumina2"
    lum._extra = {}
    lum._lock = threading.Lock()
    lum.model = _M()
    with pytest.raises(ValueError, match="SDXL-only"):
        lum.generate_batch(
            [GenerationParams(prompt="x", width=64, height=64, cfg_rescale=0.5)]
        )
    lum.generate_batch(
        [GenerationParams(prompt="x", width=64, height=64,
                          renorm_cfg=1.5, cfg_trunc_ratio=0.25)]
    )
    assert calls["renorm_cfg_scale"] == 1.5
    assert calls["cfg_truncation_ratio"] == 0.25

    # distilled_guidance reaches flux's generate; other families refuse it
    with pytest.raises(ValueError, match="Flux-only"):
        sdxl_like.generate_batch(
            [GenerationParams(prompt="x", width=64, height=64,
                              distilled_guidance=3.5)]
        )
    flux_like = T2IModel.__new__(T2IModel)
    flux_like._family = "flux"
    flux_like._extra = {}
    flux_like._lock = threading.Lock()
    flux_calls = {}

    class _F:
        def generate(self, **kw):
            flux_calls.update(kw)
            return [None]

    flux_like.model = _F()
    flux_like.generate_batch(
        [GenerationParams(prompt="x", width=64, height=64,
                          distilled_guidance=3.5)]
    )
    assert flux_calls["distilled_guidance_scale"] == 3.5

    # compiled-program key includes the new knobs
    a = GenerationParams(prompt="a", width=64, height=64, renorm_cfg=1.0)
    b = GenerationParams(prompt="b", width=64, height=64, renorm_cfg=2.0)
    c = GenerationParams(prompt="c", width=64, height=64, cfg_trunc_ratio=0.5)
    d = GenerationParams(prompt="d", width=64, height=64, distilled_guidance=3.5)
    assert len({batch_key(p) for p in (a, b, c, d)}) == 4

    # validation bounds
    with pytest.raises(ValueError):
        GenerationParams(prompt="x", width=64, height=64, renorm_cfg=-0.1)
    with pytest.raises(ValueError):
        GenerationParams(prompt="x", width=64, height=64, cfg_trunc_ratio=1.5)
    with pytest.raises(ValueError):
        GenerationParams(prompt="x", width=64, height=64, frames=0)

    # frames reaches wan's generate (defaulted to 16); image families refuse
    with pytest.raises(ValueError, match="Wan-only"):
        sdxl_like.generate_batch(
            [GenerationParams(prompt="x", width=64, height=64, frames=8)]
        )
    wan_like = T2IModel.__new__(T2IModel)
    wan_like._family = "wan"
    wan_like._extra = {}
    wan_like._lock = threading.Lock()
    wan_calls = {}

    class _W:
        def generate(self, **kw):
            wan_calls.update(kw)
            return [[None]]

    wan_like.model = _W()
    wan_like.generate_batch([GenerationParams(prompt="x", width=64, height=64)])
    assert wan_calls["frames"] == 16
    wan_like.generate_batch(
        [GenerationParams(prompt="x", width=64, height=64, frames=8)]
    )
    assert wan_calls["frames"] == 8
    # frames is part of the compiled-program key
    e = GenerationParams(prompt="e", width=64, height=64, frames=8)
    f = GenerationParams(prompt="f", width=64, height=64, frames=16)
    assert batch_key(e) != batch_key(f)


def test_http_video_response():
    """A wan-family result (list of frames) comes back as video/mp4."""

    class VideoStub(StubModel):
        def generate_batch(self, batch):
            self.batches.append(list(batch))
            return [
                [Image.new("RGB", (p.width, p.height)) for _ in range(4)]
                for p in batch
            ]

    batcher = MicroBatcher(VideoStub(), max_batch=2, window_ms=5)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(batcher))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        payload = json.dumps(
            {"prompt": "hi", "width": 64, "height": 64, "frames": 4, "fps": 8}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=payload,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.status == 200
            assert r.headers["Content-Type"] == "video/mp4"
            assert len(r.read()) > 0
    finally:
        server.shutdown()


def test_continuous_scheduler_validation():
    """ContinuousScheduler rejects family-foreign params, off-pool sizes
    and non-sdxl families before any device work."""
    import pytest

    from tools.inference_server import ContinuousScheduler, T2IModel

    unsupported = T2IModel.__new__(T2IModel)
    unsupported._family = "wan"
    with pytest.raises(ValueError, match="currently serves"):
        ContinuousScheduler(unsupported, height=64, width=64)

    sched = ContinuousScheduler.__new__(ContinuousScheduler)
    sched.height, sched.width = 64, 64
    sched._family = "sdxl"
    with pytest.raises(ValueError, match="fixed at 64x64"):
        sched.submit(GenerationParams(prompt="x", width=128, height=64))
    with pytest.raises(ValueError, match="Lumina2-only"):
        sched.submit(
            GenerationParams(prompt="x", width=64, height=64, renorm_cfg=2.0)
        )
    with pytest.raises(ValueError, match="Flux-only"):
        sched.submit(
            GenerationParams(
                prompt="x", width=64, height=64, distilled_guidance=3.0
            )
        )
    with pytest.raises(ValueError, match="Wan-only"):
        sched.submit(GenerationParams(prompt="x", width=64, height=64, frames=8))
    # the lumina2 pool owns renorm/trunc but refuses SDXL's rescale
    lum = ContinuousScheduler.__new__(ContinuousScheduler)
    lum.height, lum.width = 64, 64
    lum._family = "lumina2"
    with pytest.raises(ValueError, match="SDXL-only"):
        lum.submit(
            GenerationParams(prompt="x", width=64, height=64, cfg_rescale=0.5)
        )


def test_continuous_scheduler_serves_all_five_t2i_families():
    """r5: cogview4/flux joined the slot-pool scheduler — construction
    accepts them (adapter map) and a flux pool passes its own
    distilled_guidance through to the engine request."""
    from tools.inference_server import ContinuousScheduler
    from vision_ft_tpu.serving import SlotRequest

    flux = ContinuousScheduler.__new__(ContinuousScheduler)
    flux.height, flux.width = 64, 64
    flux._family = "flux"
    flux._SlotRequest = SlotRequest
    seen = {}

    class _Engine:
        def submit(self, req):
            seen["req"] = req
            return "img"

    flux._engine = _Engine()
    out = flux.submit(
        GenerationParams(
            prompt="x", width=64, height=64, distilled_guidance=3.5,
            cfg_scale=1.0,
        )
    )
    assert out == "img"
    assert seen["req"].distilled_guidance == 3.5

    # cogview4 is in the adapter map (construction reaches the adapter,
    # which needs a real model — the map lookup itself must not raise)
    import tools.inference_server as srv

    src = open(srv.__file__).read()
    for fam in ("sdxl", "lumina2", "auraflow", "cogview4", "flux"):
        assert f'"{fam}":' in src.split("adapters = {")[1].split("}")[0], fam
