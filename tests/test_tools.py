"""Tools: quantize CLI semantics, inference server HTTP plumbing."""

import json
import sys
import threading
import time
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, "/root/repo")

from vision_ft_tpu.modules.quant import quantize_state_dict
from vision_ft_tpu.utils import safetensors as st


def test_quantize_state_dict_respects_targeting(tmp_path):
    rng = np.random.default_rng(0)
    sd = {
        "model.a.weight": jnp.asarray(rng.standard_normal((32, 64)), jnp.float32),
        "model.t_embedder.weight": jnp.asarray(rng.standard_normal((8, 8)), jnp.float32),
    }
    out = quantize_state_dict(sd, "bnb_nf4", ["model."], ["t_embedder"])
    assert "model.a.weight.absmax" in out
    assert out["model.a.weight"].dtype == jnp.uint8
    assert "model.t_embedder.weight.absmax" not in out
    # safetensors round trip keeps the uint8 payloads
    path = str(tmp_path / "q.safetensors")
    st.save_file(out, path)
    loaded = st.load_file(path)
    np.testing.assert_array_equal(
        np.asarray(loaded["model.a.weight"]), np.asarray(out["model.a.weight"])
    )


class _StubModel:
    def __init__(self, delay_s: float = 0.0):
        self.calls = []  # one entry per generate_batch call (a list of params)
        self.delay_s = delay_s

    def generate_batch(self, batch):
        self.calls.append(batch)
        if self.delay_s:
            time.sleep(self.delay_s)
        return [
            Image.new("RGB", (p.width, p.height), (128, 0, 0)) for p in batch
        ]


@pytest.fixture
def server():
    from tools.inference_server import MicroBatcher, make_handler

    model = _StubModel()
    batcher = MicroBatcher(model, max_batch=4, window_ms=5.0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(batcher))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield httpd, model
    httpd.shutdown()


def test_inference_server_round_trip(server):
    httpd, model = server
    port = httpd.server_address[1]
    body = json.dumps({"prompt": "a cat", "width": 64, "height": 128}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict", data=body,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:
        assert resp.headers["Content-Type"] == "image/webp"
        data = resp.read()
    from io import BytesIO

    img = Image.open(BytesIO(data))
    assert img.size == (64, 128)
    assert model.calls[0][0].prompt == "a cat"
    assert model.calls[0][0].cfg_scale == 6.5  # default

    # health endpoint
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as resp:
        assert json.loads(resp.read())["status"] == "ok"


def test_inference_server_validation(server):
    httpd, _ = server
    port = httpd.server_address[1]
    # width not divisible by 64 -> 422 (reference inference_server.py:27-31)
    body = json.dumps({"prompt": "x", "width": 100}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict", data=body,
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as excinfo:
        urllib.request.urlopen(req)
    assert excinfo.value.code == 422


def test_micro_batcher_collates_compatible_requests():
    """4 concurrent same-shape requests -> ONE generate_batch call;
    an incompatible shape stays out of the group (tracked config #5's
    batched-server behavior)."""
    from tools.inference_server import GenerationParams, MicroBatcher

    model = _StubModel(delay_s=0.05)
    batcher = MicroBatcher(model, max_batch=4, window_ms=100.0)

    same = GenerationParams(prompt="a", width=64, height=64, inference_steps=2)
    other = GenerationParams(prompt="b", width=128, height=64, inference_steps=2)

    results = {}

    def worker(i, params):
        results[i] = batcher.submit(params)

    threads = [
        threading.Thread(target=worker, args=(i, same)) for i in range(4)
    ] + [threading.Thread(target=worker, args=(9, other))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)

    assert len(results) == 5
    sizes = sorted(len(c) for c in model.calls)
    # one batch of 4 compatible + the lone incompatible one
    assert sizes == [1, 4]
    assert results[9].size == (128, 64)


def test_micro_batcher_pads_to_power_of_two_bucket():
    """An odd-sized group is padded to the next power-of-2 bucket so the
    server only ever compiles log2(max_batch)+1 batch shapes; callers
    still get exactly their own images back."""
    from tools.inference_server import GenerationParams, MicroBatcher

    model = _StubModel(delay_s=0.05)
    batcher = MicroBatcher(model, max_batch=8, window_ms=150.0)

    same = GenerationParams(prompt="a", width=64, height=64, inference_steps=2)
    results = {}

    def worker(i):
        results[i] = batcher.submit(same)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)

    assert len(results) == 3
    assert all(img.size == (64, 64) for img in results.values())
    # the model saw the padded bucket (3 -> 4), not the raw group size
    assert sorted(len(c) for c in model.calls) == [4]

    # opting out keeps exact group sizes
    model2 = _StubModel(delay_s=0.05)
    batcher2 = MicroBatcher(model2, max_batch=8, window_ms=150.0,
                            pad_to_bucket=False)
    results.clear()

    def worker2(i):
        results[i] = batcher2.submit(same)

    threads = [threading.Thread(target=worker2, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    assert sorted(len(c) for c in model2.calls) == [3]


def _cpu_env():
    import os

    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_to_safetensors_tool(tmp_path):
    import subprocess
    import sys

    import torch

    from vision_ft_tpu.utils import safetensors as st

    pt_path = str(tmp_path / "model.pt")
    torch.save({"layer.weight": torch.ones(3, 4), "layer.bias": torch.zeros(3)}, pt_path)
    out_path = str(tmp_path / "model.safetensors")
    result = subprocess.run(
        [sys.executable, "tools/checkpoint/to_safetensors.py", pt_path, out_path],
        capture_output=True, text=True, env=_cpu_env(),
    )
    assert result.returncode == 0, result.stderr
    sd = st.load_file(out_path)
    assert set(sd) == {"layer.weight", "layer.bias"}
    np.testing.assert_array_equal(np.asarray(sd["layer.weight"]), 1.0)


def test_snapshot_max_memory_tool():
    import subprocess
    import sys

    result = subprocess.run(
        [sys.executable, "tools/snapshot_max_memory.py"],
        capture_output=True, text=True, env=_cpu_env(),
    )
    assert result.returncode == 0, result.stderr
    assert "peak_bytes_in_use" in result.stdout


def test_cogview4_quant_compare_imports():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "cogview4_quant_compare", "tools/cogview4_quant_compare.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.quantize_model)
