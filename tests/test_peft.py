"""PEFT engine tests (model: reference tests/test_peft.py — zero-init
identity, regex targeting, adapter key layout, enable/disable)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_ft_tpu.nn import Linear, Conv2d, ModuleDict, flatten_params
from vision_ft_tpu.modules.peft import (
    LoHaConfig,
    LoRAConfig,
    PeftTargetConfig,
    RegexMatch,
    calculate_trainable_parameters,
    detect_peft_method,
    get_adapter_parameters,
    load_peft_weight,
    merge_params,
    replace_to_peft_layer,
    split_peft_params,
    while_peft_disabled,
)
from vision_ft_tpu.modules.peft.functional import find_targetable_paths


def _toy_model():
    model = ModuleDict(
        {
            "attn1": ModuleDict(
                {"to_q": Linear(16, 16), "to_k": Linear(16, 16), "to_out": Linear(16, 16)}
            ),
            "ff": ModuleDict({"net": ModuleDict({"0": Linear(16, 32), "2": Linear(32, 16)})}),
            "conv": Conv2d(4, 8, 3, padding=1),
        }
    )
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_find_targetable_paths():
    _, params = _toy_model()
    paths = set(find_targetable_paths(params))
    assert "attn1.to_q" in paths and "ff.net.0" in paths and "conv" in paths


def test_lora_zero_init_identity():
    model, params = _toy_model()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    base_out = model["attn1"]["to_q"](params["attn1"]["to_q"], x)

    peft_params = replace_to_peft_layer(
        params, ["attn1"], [], LoRAConfig(rank=4, alpha=1.0, dtype="float32"),
        jax.random.PRNGKey(2),
    )
    lora_out = model["attn1"]["to_q"](peft_params["attn1"]["to_q"], x)
    np.testing.assert_allclose(np.asarray(lora_out), np.asarray(base_out), atol=1e-6)
    # nonzero up weight changes the output
    peft_params["attn1"]["to_q"]["lora_up"]["weight"] = jnp.ones((16, 4)) * 0.1
    changed = model["attn1"]["to_q"](peft_params["attn1"]["to_q"], x)
    assert float(jnp.abs(changed - base_out).max()) > 1e-3


def test_loha_zero_init_identity():
    model, params = _toy_model()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    base_out = model["attn1"]["to_q"](params["attn1"]["to_q"], x)
    peft_params = replace_to_peft_layer(
        params, ["to_q"], [], LoHaConfig(rank=4, dtype="float32"), jax.random.PRNGKey(2)
    )
    out = model["attn1"]["to_q"](peft_params["attn1"]["to_q"], x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base_out), atol=1e-6)
    assert detect_peft_method(get_adapter_parameters(peft_params)) == "loha"


def test_conv_lora_zero_init_identity():
    model, params = _toy_model()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    base_out = model["conv"](params["conv"], x)
    peft_params = replace_to_peft_layer(
        params, ["conv"], [], LoRAConfig(rank=2, dtype="float32"), jax.random.PRNGKey(2)
    )
    out = model["conv"](peft_params["conv"], x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base_out), atol=1e-6)
    # conv lora shapes follow kohya layout
    sub = peft_params["conv"]
    assert sub["lora_down"]["weight"].shape == (2, 4, 3, 3)
    assert sub["lora_up"]["weight"].shape == (8, 2, 1, 1)


def test_include_exclude_targeting():
    _, params = _toy_model()
    config = LoRAConfig(rank=2, dtype="float32")
    peft_params = replace_to_peft_layer(
        params,
        include_keys=["attn1", RegexMatch(regex=r"^ff\.net\.\d+$")],
        exclude_keys=["to_out"],
        config=config,
        key=jax.random.PRNGKey(0),
    )
    adapters = get_adapter_parameters(peft_params)
    roots = {k.rsplit(".lora", 1)[0].rsplit(".alpha", 1)[0] for k in adapters}
    assert roots == {"attn1.to_q", "attn1.to_k", "ff.net.0", "ff.net.2"}
    # key layout matches torch adapter state dicts
    assert "attn1.to_q.lora_down.weight" in adapters
    assert "attn1.to_q.lora_up.weight" in adapters
    assert "attn1.to_q.alpha" in adapters


def test_empty_include_keys_rejected():
    with pytest.raises(ValueError):
        PeftTargetConfig(include_keys=[], config=LoRAConfig(rank=4))


def test_split_merge_roundtrip():
    _, params = _toy_model()
    peft_params = replace_to_peft_layer(
        params, ["attn1"], [], LoRAConfig(rank=4, dtype="float32"), jax.random.PRNGKey(0)
    )
    trainable, frozen = split_peft_params(peft_params)
    t_keys = set(flatten_params(trainable))
    assert all(("lora_down" in k or "lora_up" in k) for k in t_keys)
    assert "attn1.to_q.alpha" in flatten_params(frozen)  # alpha frozen
    merged = merge_params(frozen, trainable)
    assert flatten_params(merged).keys() == flatten_params(peft_params).keys()
    stats = calculate_trainable_parameters(peft_params)
    assert 0 < stats.trainable_params < stats.all_param


def test_load_peft_weight_roundtrip():
    model, params = _toy_model()
    peft_params = replace_to_peft_layer(
        params, ["to_q"], [], LoRAConfig(rank=4, alpha=2.0, dtype="float32"),
        jax.random.PRNGKey(0),
    )
    peft_params["attn1"]["to_q"]["lora_up"]["weight"] = jax.random.normal(
        jax.random.PRNGKey(5), (16, 4)
    )
    adapters = get_adapter_parameters(peft_params)
    # load into fresh base params
    loaded = load_peft_weight(params, adapters)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    a = model["attn1"]["to_q"](peft_params["attn1"]["to_q"], x)
    b = model["attn1"]["to_q"](loaded["attn1"]["to_q"], x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    with pytest.raises(KeyError):
        load_peft_weight(params, {"nonexistent.lora_up.weight": jnp.zeros((4, 4)),
                                  "nonexistent.lora_down.weight": jnp.zeros((4, 4))})
    with pytest.raises(ValueError):
        load_peft_weight(params, {"no.adapters.here": jnp.zeros((4,))})


def test_while_peft_disabled():
    model, params = _toy_model()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    base_out = model["attn1"]["to_q"](params["attn1"]["to_q"], x)
    peft_params = replace_to_peft_layer(
        params, ["to_q"], [], LoRAConfig(rank=4, dtype="float32"), jax.random.PRNGKey(0)
    )
    peft_params["attn1"]["to_q"]["lora_up"]["weight"] = jnp.ones((16, 4))
    enabled_out = model["attn1"]["to_q"](peft_params["attn1"]["to_q"], x)
    assert float(jnp.abs(enabled_out - base_out).max()) > 1e-2
    with while_peft_disabled():
        disabled_out = model["attn1"]["to_q"](peft_params["attn1"]["to_q"], x)
    np.testing.assert_allclose(np.asarray(disabled_out), np.asarray(base_out), atol=1e-6)


def test_lora_matches_manual_computation():
    """LoRA delta == x @ down^T @ up^T * alpha/rank (reference lora.py:100-108)."""
    model, params = _toy_model()
    rank, alpha = 4, 8.0
    peft_params = replace_to_peft_layer(
        params, ["to_q"], [], LoRAConfig(rank=rank, alpha=alpha, dtype="float32"),
        jax.random.PRNGKey(0),
    )
    up = jax.random.normal(jax.random.PRNGKey(5), (16, rank))
    peft_params["attn1"]["to_q"]["lora_up"]["weight"] = up
    down = peft_params["attn1"]["to_q"]["lora_down"]["weight"]
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    out = model["attn1"]["to_q"](peft_params["attn1"]["to_q"], x)
    base = model["attn1"]["to_q"](params["attn1"]["to_q"], x)
    manual = (x @ down.T @ up.T) * (alpha / rank)
    np.testing.assert_allclose(np.asarray(out - base), np.asarray(manual), rtol=2e-4, atol=1e-5)


def test_gradients_flow_only_through_adapters():
    model, params = _toy_model()
    peft_params = replace_to_peft_layer(
        params, ["to_q"], [], LoRAConfig(rank=4, dtype="float32"), jax.random.PRNGKey(0)
    )
    trainable, frozen = split_peft_params(peft_params)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16))

    def loss(tr):
        merged = merge_params(frozen, tr)
        return jnp.sum(model["attn1"]["to_q"](merged["attn1"]["to_q"], x) ** 2)

    grads = jax.grad(loss)(trainable)
    g = flatten_params(grads)
    # down grad is nonzero only after up becomes nonzero; up grad nonzero
    assert float(jnp.abs(g["attn1.to_q.lora_up.weight"]).max()) > 0


def test_lora_concat_dot_matches_delta_formulation():
    """The fused concat dot (nn.core._lora_concat_dot, default path) must
    match the separate-delta formulation (VFT_LORA_CONCAT=0) in both the
    forward and the adapter gradients — the custom VJP hand-writes the
    backward so plain-AD parity is the correctness oracle."""
    import os

    model, params = _toy_model()
    peft_params = replace_to_peft_layer(
        params, ["to_q"], [], LoRAConfig(rank=4, alpha=2.0, dtype="float32"),
        jax.random.PRNGKey(0),
    )
    # non-zero up so the delta actually contributes
    peft_params["attn1"]["to_q"]["lora_up"]["weight"] = jax.random.normal(
        jax.random.PRNGKey(5), peft_params["attn1"]["to_q"]["lora_up"]["weight"].shape
    ) * 0.3
    trainable, frozen = split_peft_params(peft_params)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 5, 16))  # >2D leading dims

    def loss(tr, xin):
        merged = merge_params(frozen, tr)
        return jnp.sum(model["attn1"]["to_q"](merged["attn1"]["to_q"], xin) ** 2)

    def run():
        out = model["attn1"]["to_q"](
            merge_params(frozen, trainable)["attn1"]["to_q"], x
        )
        g_tr = jax.grad(loss, 0)(trainable, x)
        g_x = jax.grad(loss, 1)(trainable, x)
        return out, flatten_params(g_tr), g_x

    os.environ["VFT_LORA_CONCAT"] = "1"
    try:
        out_c, g_c, gx_c = run()
    finally:
        del os.environ["VFT_LORA_CONCAT"]
    out_d, g_d, gx_d = run()  # default path: separate delta

    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_d), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_d), rtol=1e-4, atol=1e-4)
    for key in g_d:
        np.testing.assert_allclose(
            np.asarray(g_c[key]), np.asarray(g_d[key]), rtol=1e-4, atol=1e-4,
            err_msg=key,
        )
