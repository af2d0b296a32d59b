"""Numerical parity of core layers vs torch equivalents (fp32, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vision_ft_tpu.nn import (
    Conv2d,
    Embedding,
    GroupNorm,
    LayerNorm,
    Linear,
    RMSNorm,
    flatten_params,
    unflatten_params,
)

ATOL = 1e-5


def test_flatten_unflatten_roundtrip():
    tree = {"a": {"b": {"weight": jnp.ones(2)}, "c": jnp.zeros(3)}, "d": jnp.ones(1)}
    flat = flatten_params(tree)
    assert set(flat) == {"a.b.weight", "a.c", "d"}
    rebuilt = unflatten_params(flat)
    assert jnp.array_equal(rebuilt["a"]["b"]["weight"], tree["a"]["b"]["weight"])


def test_linear_matches_torch():
    torch.manual_seed(0)
    tl = torch.nn.Linear(16, 8)
    x = torch.randn(2, 5, 16)
    expected = tl(x).detach().numpy()

    layer = Linear(16, 8)
    params = {
        "weight": jnp.asarray(tl.weight.detach().numpy()),
        "bias": jnp.asarray(tl.bias.detach().numpy()),
    }
    got = layer(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), expected, atol=ATOL)


def test_conv2d_matches_torch():
    torch.manual_seed(0)
    tc = torch.nn.Conv2d(3, 6, kernel_size=3, stride=2, padding=1)
    x = torch.randn(2, 3, 9, 9)
    expected = tc(x).detach().numpy()  # NCHW

    layer = Conv2d(3, 6, kernel_size=3, stride=2, padding=1)
    params = {
        "weight": jnp.asarray(tc.weight.detach().numpy()),
        "bias": jnp.asarray(tc.bias.detach().numpy()),
    }
    x_nhwc = jnp.asarray(x.numpy()).transpose(0, 2, 3, 1)
    got = layer(params, x_nhwc).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(np.asarray(got), expected, atol=ATOL)


def test_layernorm_matches_torch():
    torch.manual_seed(0)
    tl = torch.nn.LayerNorm(16)
    with torch.no_grad():
        tl.weight.normal_()
        tl.bias.normal_()
    x = torch.randn(4, 7, 16)
    expected = tl(x).detach().numpy()

    layer = LayerNorm(16)
    params = {
        "weight": jnp.asarray(tl.weight.detach().numpy()),
        "bias": jnp.asarray(tl.bias.detach().numpy()),
    }
    got = layer(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), expected, atol=ATOL)


def test_groupnorm_matches_torch():
    torch.manual_seed(0)
    tg = torch.nn.GroupNorm(4, 16, eps=1e-6)
    with torch.no_grad():
        tg.weight.normal_()
        tg.bias.normal_()
    x = torch.randn(2, 16, 5, 5)
    expected = tg(x).detach().numpy()

    layer = GroupNorm(4, 16, eps=1e-6)
    params = {
        "weight": jnp.asarray(tg.weight.detach().numpy()),
        "bias": jnp.asarray(tg.bias.detach().numpy()),
    }
    x_nhwc = jnp.asarray(x.numpy()).transpose(0, 2, 3, 1)
    got = layer(params, x_nhwc).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(np.asarray(got), expected, atol=ATOL)


def test_rmsnorm_matches_torch():
    torch.manual_seed(0)
    x = torch.randn(3, 16)
    weight = torch.randn(16)
    # reference FP32RMSNorm semantics
    var = x.pow(2).mean(-1, keepdim=True)
    expected = (x * torch.rsqrt(var + 1e-6) * weight).numpy()

    layer = RMSNorm(16, eps=1e-6)
    got = layer({"weight": jnp.asarray(weight.numpy())}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), expected, atol=ATOL)


def test_embedding_matches_torch():
    torch.manual_seed(0)
    te = torch.nn.Embedding(10, 4)
    ids = torch.tensor([[1, 2], [3, 9]])
    expected = te(ids).detach().numpy()

    layer = Embedding(10, 4)
    got = layer({"weight": jnp.asarray(te.weight.detach().numpy())}, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(got), expected, atol=ATOL)


def test_init_shapes():
    key = jax.random.PRNGKey(0)
    p = Linear(4, 8).init(key)
    assert p["weight"].shape == (8, 4) and p["bias"].shape == (8,)
    p = Conv2d(3, 6, kernel_size=3).init(key)
    assert p["weight"].shape == (6, 3, 3, 3)


def test_cached_jit_respects_peft_toggle():
    """A cached trace that baked adapters-on must not be served after
    set_peft_enabled(False) (cache key includes the trace-time flag)."""
    import jax
    import jax.numpy as jnp

    from vision_ft_tpu.nn.core import Linear, cached_jit, set_peft_enabled

    lin = Linear(8, 8)
    params = lin.init(jax.random.PRNGKey(0))
    params["lora_down"] = {"weight": jnp.ones((2, 8)) * 0.1}
    params["lora_up"] = {"weight": jnp.ones((8, 2)) * 0.1}
    params["alpha"] = jnp.asarray(2.0)

    class Holder:
        pass

    h = Holder()
    x = jnp.ones((1, 8))
    fn = cached_jit(h, "lin", lambda p, x: lin(p, x))
    with_adapter = fn(params, x)
    try:
        set_peft_enabled(False)
        fn2 = cached_jit(h, "lin", lambda p, x: lin(p, x))
        without_adapter = fn2(params, x)
    finally:
        set_peft_enabled(True)
    import numpy as np

    assert not np.allclose(np.asarray(with_adapter), np.asarray(without_adapter))
    base = lin({k: v for k, v in params.items() if not k.startswith(("lora", "alpha"))}, x)
    np.testing.assert_allclose(np.asarray(without_adapter), np.asarray(base), atol=1e-6)
