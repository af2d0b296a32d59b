"""Step-level continuous batching (vision_ft_tpu.serving.continuous).

Contract under test: a request scheduled through the slot pool is
numerically equivalent to the same request run through plain batch-1
``generate()`` — including when it shares the pool with requests at
other denoise steps, step counts, seeds and guidance scales. The
reference serves one request at a time
(/root/reference/tools/inference_server.py:19-136); this engine is the
TPU-native upgrade, so its correctness bar is exact-schedule parity.
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.models.test_sdxl_pipeline import tiny_model
from vision_ft_tpu.serving import ContinuousBatcher, SDXLSlotAdapter, SlotRequest


@pytest.fixture(scope="module")
def model():
    m = tiny_model()
    m.init_params(jax.random.key(0))
    return m


def _images_close(a, b, tol=2):
    """uint8 image comparison with a tiny quantization allowance: the slot
    step and the scan loop are different XLA programs, so float results can
    differ in the last ulps and straddle a uint8 rounding boundary."""
    a = np.asarray(a, np.int16)
    b = np.asarray(b, np.int16)
    np.testing.assert_array_less(np.abs(a - b).max(), tol + 1)


def test_slot_step_matches_denoise_step(model):
    """One active slot in a 2-slot pool reproduces the batch-1 jit step."""
    h = w = 8
    c = model.denoiser.config.in_channels
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((1, h, w, c), np.float32))
    emb = jnp.asarray(rng.standard_normal((2, 77, 112), np.float32))
    pooled = jnp.asarray(rng.standard_normal((2, 1280), np.float32))
    sizes = jnp.broadcast_to(jnp.asarray([64.0, 64.0], jnp.float32), (2, 2))
    crop = jnp.zeros((2, 2), jnp.float32)
    sigma, next_sigma, t = 9.5, 4.2, 800.0

    ref = model._denoise_step(
        model.params["denoiser"], lat, jnp.float32(t), jnp.float32(sigma),
        jnp.float32(next_sigma), emb, pooled, sizes, sizes, crop,
        jnp.float32(3.0), jnp.float32(0.25), jnp.int32(123), do_cfg=True,
    )

    # pool layout: slot 0 = the request, slot 1 = inactive garbage
    s = 2
    pool_lat = jnp.concatenate([lat, jnp.zeros_like(lat)])
    pool_emb = jnp.stack([emb[0], jnp.zeros_like(emb[0]), emb[1], jnp.zeros_like(emb[1])])
    pool_pooled = jnp.stack(
        [pooled[0], jnp.zeros_like(pooled[0]), pooled[1], jnp.zeros_like(pooled[1])]
    )
    size4 = jnp.broadcast_to(jnp.asarray([64.0, 64.0], jnp.float32), (2 * s, 2))
    out = model._slot_step(
        model.params["denoiser"], pool_lat,
        jnp.asarray([t, 0.0], jnp.float32),
        jnp.asarray([sigma, 0.0], jnp.float32),
        jnp.asarray([next_sigma, 0.0], jnp.float32),
        pool_emb, pool_pooled, size4, size4, jnp.zeros((2 * s, 2), jnp.float32),
        jnp.asarray([3.0, 1.0], jnp.float32),
        jnp.asarray([0.25, 0.0], jnp.float32),
        jnp.asarray([123, 0], jnp.int32),
        jnp.asarray([True, False]),
    )
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(ref[0]), rtol=2e-5, atol=2e-5
    )
    # inactive slot unchanged
    np.testing.assert_array_equal(np.asarray(out[1]), 0.0)


def test_pool_parity_with_generate(model):
    """Three concurrent requests with DIFFERENT step counts, seeds and
    guidance scales each match their own batch-1 generate()."""
    requests = [
        SlotRequest("a photo of a cat", "blurry", num_inference_steps=3,
                    cfg_scale=3.0, seed=42),
        SlotRequest("a painting of a dog", "", num_inference_steps=5,
                    cfg_scale=5.0, cfg_rescale=0.3, seed=7),
        SlotRequest("a city at night", "low quality", num_inference_steps=4,
                    cfg_scale=2.0, seed=1234),
    ]
    expected = [
        model.generate(
            r.prompt, negative_prompt=r.negative_prompt or None,
            width=64, height=64, num_inference_steps=r.num_inference_steps,
            cfg_scale=r.cfg_scale, cfg_rescale=r.cfg_rescale, seed=r.seed,
        )[0]
        for r in requests
    ]

    adapter = SDXLSlotAdapter(model, height=64, width=64)
    engine = ContinuousBatcher(adapter, num_slots=2, max_steps=16)
    try:
        results = [None] * len(requests)

        def run(i):
            results[i] = engine.submit(requests[i])

        threads = [threading.Thread(target=run, args=(i,)) for i in range(3)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        assert all(r is not None for r in results)
    finally:
        engine.close()

    for got, want in zip(results, expected):
        _images_close(got, want)


def test_staggered_admission(model):
    """A request that arrives while another is mid-denoise joins the pool
    at a step boundary and still matches batch-1 generate()."""
    adapter = SDXLSlotAdapter(model, height=64, width=64)
    engine = ContinuousBatcher(adapter, num_slots=2, max_steps=16)
    r1 = SlotRequest("first request", num_inference_steps=6, cfg_scale=3.0, seed=11)
    r2 = SlotRequest("second request", num_inference_steps=3, cfg_scale=4.0, seed=22)
    try:
        results = {}

        def run(name, r, delay):
            time.sleep(delay)
            results[name] = engine.submit(r)

        t1 = threading.Thread(target=run, args=("r1", r1, 0.0))
        t2 = threading.Thread(target=run, args=("r2", r2, 0.5))
        t1.start(); t2.start()
        t1.join(timeout=300); t2.join(timeout=300)
    finally:
        engine.close()

    for name, r in (("r1", r1), ("r2", r2)):
        want = model.generate(
            r.prompt, width=64, height=64,
            num_inference_steps=r.num_inference_steps,
            cfg_scale=r.cfg_scale, seed=r.seed,
        )[0]
        _images_close(results[name], want)


def test_more_requests_than_slots(model):
    """Queue depth > pool size: later requests wait for a free slot and
    still complete correctly."""
    adapter = SDXLSlotAdapter(model, height=64, width=64)
    engine = ContinuousBatcher(adapter, num_slots=1, max_steps=8)
    reqs = [
        SlotRequest(f"prompt {i}", num_inference_steps=2, cfg_scale=2.0, seed=i)
        for i in range(3)
    ]
    try:
        results = [None] * 3
        threads = [
            threading.Thread(target=lambda i=i: results.__setitem__(i, engine.submit(reqs[i])))
            for i in range(3)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        assert all(r is not None for r in results)
    finally:
        engine.close()
    # distinct seeds -> distinct images
    assert not np.array_equal(np.asarray(results[0]), np.asarray(results[1]))


def test_rejects_over_max_steps(model):
    adapter = SDXLSlotAdapter(model, height=64, width=64)
    engine = ContinuousBatcher(adapter, num_slots=1, max_steps=4)
    try:
        with pytest.raises(ValueError, match="exceeds"):
            engine.submit(SlotRequest("x", num_inference_steps=9))
    finally:
        engine.close()


def test_submit_after_close_raises(model):
    adapter = SDXLSlotAdapter(model, height=64, width=64)
    engine = ContinuousBatcher(adapter, num_slots=1, max_steps=4)
    engine.close()
    with pytest.raises(RuntimeError, match="closed"):
        engine.submit(SlotRequest("x", num_inference_steps=2))


def test_http_server_with_continuous_scheduler(model):
    """The HTTP surface serves through the continuous scheduler: staggered
    posts with different step counts all return images, and off-pool sizes
    get a 500 with the pool-size message."""
    import json
    import urllib.error
    import urllib.request
    from http.server import ThreadingHTTPServer

    from tools.inference_server import ContinuousScheduler, T2IModel, make_handler

    wrapper = T2IModel.__new__(T2IModel)
    wrapper._family = "sdxl"
    wrapper.model = model
    sched = ContinuousScheduler(wrapper, height=64, width=64, num_slots=2,
                                max_steps=8)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(sched))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        responses = [None] * 3

        def post(i):
            payload = json.dumps({
                "prompt": f"staggered {i}", "width": 64, "height": 64,
                "inference_steps": 2 + i, "seed": i,
            }).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict", data=payload,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                responses[i] = (r.status, r.headers["Content-Type"], r.read())

        threads = [threading.Thread(target=post, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
            time.sleep(0.2)  # staggered arrival: joins mid-flight pools
        for t in threads:
            t.join(timeout=300)
        for r in responses:
            assert r is not None and r[0] == 200 and r[1] == "image/webp"
            assert len(r[2]) > 0

        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps({"prompt": "x", "width": 128, "height": 64}).encode(),
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(bad, timeout=30)
        assert exc_info.value.code == 500
    finally:
        server.shutdown()
        sched.close()
