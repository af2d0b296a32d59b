"""Quantization: NF4/FP4 pack-dequant round trips in the bnb on-disk
format, prequantized checkpoint loading, fp8/int8 paths, QLoRA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_ft_tpu.nn import Linear, ModuleDict, flatten_params, unflatten_params
from vision_ft_tpu.modules.quant import (
    convert_prequantized_state_dict,
    dequantize_weight,
    get_quant_type_from_children_dict,
    quantize_4bit,
    quantize_params,
    quantize_state_dict,
    quantize_weight,
)
from vision_ft_tpu.modules.quant.nf4 import (
    DYNAMIC_MAP,
    NF4_CODE,
    dequantize_4bit,
    parse_quant_state,
)


def test_nf4_codebook_properties():
    assert NF4_CODE.shape == (16,)
    assert NF4_CODE[0] == -1.0 and NF4_CODE[-1] == 1.0 and NF4_CODE[7] == 0.0
    assert (np.diff(NF4_CODE) > 0).all()
    assert DYNAMIC_MAP.shape == (256,)
    assert (np.diff(DYNAMIC_MAP) >= 0).all()
    # bnb's map appends +1.0 but not -1.0: min is the largest negative code
    assert DYNAMIC_MAP[-1] == 1.0 and -1.0 < DYNAMIC_MAP[0] < -0.99


def test_nf4_roundtrip_error():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 128)).astype(np.float32) * 0.02
    packed, state = quantize_4bit(w, "nf4")
    assert packed.dtype == np.uint8 and packed.shape == (64 * 128 // 2, 1)
    parsed = parse_quant_state(state)
    assert parsed["shape"] == (64, 128) and parsed["blocksize"] == 64
    deq = np.asarray(
        dequantize_4bit(jnp.asarray(packed), parsed["code"], parsed["absmax"], (64, 128))
    )
    # NF4 relative error for gaussian weights ~ few %
    rel = np.abs(deq - w).mean() / np.abs(w).mean()
    assert rel < 0.1
    # exact re-quantization fixed point
    packed2, _ = quantize_4bit(deq, "nf4")
    np.testing.assert_array_equal(packed2, packed)


def test_nf4_nested_statistics_roundtrip():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((32, 256)).astype(np.float32)
    packed_plain, state_plain = quantize_4bit(w, "nf4", compress_statistics=False)
    packed_nested, state_nested = quantize_4bit(w, "nf4", compress_statistics=True)
    np.testing.assert_array_equal(packed_plain, packed_nested)
    assert state_nested["absmax"].dtype == np.uint8
    a_plain = np.asarray(parse_quant_state(state_plain)["absmax"])
    a_nested = np.asarray(parse_quant_state(state_nested)["absmax"])
    np.testing.assert_allclose(a_nested, a_plain, rtol=0.02, atol=1e-4)


def test_prequantized_state_dict_load_and_forward():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((32, 64)).astype(np.float32) * 0.05
    b = rng.standard_normal((32,)).astype(np.float32)
    sd = {"layer.weight": jnp.asarray(w), "layer.bias": jnp.asarray(b)}
    qsd = quantize_state_dict(sd, "bnb_nf4", include_keys=["layer"])
    # bnb on-disk keys present
    assert "layer.weight.absmax" in qsd
    assert "layer.weight.quant_map" in qsd
    assert "layer.weight.quant_state.bitsandbytes__nf4" in qsd
    assert "layer.weight.nested_absmax" in qsd  # compress_statistics on disk
    children = {k[len("layer.weight."):]: v for k, v in qsd.items() if k.startswith("layer.weight.")}
    assert get_quant_type_from_children_dict(children) == "bnb_nf4"

    converted = convert_prequantized_state_dict(qsd)
    params = unflatten_params(converted)
    lin = Linear(64, 32)
    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    y_q = lin(params["layer"], x)
    y_fp = lin({"weight": jnp.asarray(w), "bias": jnp.asarray(b)}, x)
    err = float(jnp.abs(y_q - y_fp).max())
    assert err < 0.2  # nf4 quantization noise, not garbage
    # also works under jit
    y_jit = jax.jit(lambda p: lin(p, x))(params["layer"])
    np.testing.assert_allclose(np.asarray(y_jit), np.asarray(y_q), atol=1e-6)


@pytest.mark.parametrize("quant_type", ["fp8_e4m3fn", "bnb_int8", "quanto_int8", "quanto_int4", "ao_nf4", "bnb_fp4", "int8_w8a8"])
def test_quantize_params_forward(quant_type):
    rng = np.random.default_rng(3)
    model = ModuleDict({"fc": Linear(32, 16)})
    params = model.init(jax.random.PRNGKey(0))
    qparams = quantize_params(params, quant_type, include_keys=["fc"])
    x = jnp.asarray(rng.standard_normal((2, 32)), jnp.float32)
    y_fp = model["fc"](params["fc"], x)
    y_q = model["fc"](qparams["fc"], x)
    rel = float(jnp.abs(y_q - y_fp).max() / (jnp.abs(y_fp).max() + 1e-9))
    assert rel < 0.25, f"{quant_type}: rel={rel}"


def test_qlora_on_quantized_base():
    from vision_ft_tpu.modules.peft import (
        LoRAConfig,
        merge_params,
        replace_to_peft_layer,
        split_peft_params,
    )

    model = ModuleDict({"attn": ModuleDict({"to_q": Linear(32, 32)})})
    params = model.init(jax.random.PRNGKey(0))
    qparams = quantize_params(params, "bnb_nf4", include_keys=["to_q"])
    peft_params = replace_to_peft_layer(
        qparams, ["to_q"], [], LoRAConfig(rank=4, dtype="float32"), jax.random.PRNGKey(1)
    )
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32)), jnp.float32)
    base_out = model["attn"]["to_q"](qparams["attn"]["to_q"], x)
    lora_out = model["attn"]["to_q"](peft_params["attn"]["to_q"], x)
    np.testing.assert_allclose(np.asarray(lora_out), np.asarray(base_out), atol=1e-6)

    trainable, frozen = split_peft_params(peft_params)
    t_keys = set(flatten_params(trainable))
    assert t_keys == {"attn.to_q.lora_down.weight", "attn.to_q.lora_up.weight"}

    def loss(tr):
        merged = merge_params(frozen, tr)
        return jnp.sum(model["attn"]["to_q"](merged["attn"]["to_q"], x) ** 2)

    grads = jax.jit(jax.grad(loss))(trainable)
    assert jax.tree.all(jax.tree.map(lambda g: bool(jnp.all(jnp.isfinite(g))), grads))


def test_int8_w8a8_compute_path():
    """TPU W8A8: the Linear must run an s8 x s8 -> s32 dot (not dequant
    into a bf16 matmul), stay accurate, and round-trip through the
    offline quantizer + prequantized loader."""
    rng = np.random.default_rng(11)
    model = ModuleDict({"fc": Linear(64, 48)})
    params = model.init(jax.random.PRNGKey(2))
    qparams = quantize_params(params, "int8_w8a8", include_keys=["fc"])
    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)

    y_fp = model["fc"](params["fc"], x)
    y_q = model["fc"](qparams["fc"], x)
    rel = float(jnp.abs(y_q - y_fp).max() / (jnp.abs(y_fp).max() + 1e-9))
    assert rel < 0.05, f"W8A8 rel err {rel}"

    # the jaxpr really contains the int8 dot with int32 accumulation
    jaxpr = str(jax.make_jaxpr(lambda p: model["fc"](p, x))(qparams["fc"]))
    assert "preferred_element_type=int32" in jaxpr, jaxpr
    assert "convert_element_type[new_dtype=int8" in jaxpr, jaxpr

    # bf16 activations take the same path and stay close
    y_bf16 = model["fc"](qparams["fc"], x.astype(jnp.bfloat16))
    rel_bf = float(
        jnp.abs(y_bf16.astype(jnp.float32) - y_fp).max()
        / (jnp.abs(y_fp).max() + 1e-9)
    )
    assert y_bf16.dtype == jnp.bfloat16 and rel_bf < 0.05

    # offline checkpoint quantize -> prequantized grouping -> same output
    sd = {
        "fc.weight": np.asarray(params["fc"]["weight"]),
        "fc.bias": np.asarray(params["fc"]["bias"]),
    }
    qsd = quantize_state_dict(sd, "int8_w8a8", include_keys=["fc.weight"])
    assert "fc.weight.w8a8" in qsd and "fc.weight" not in qsd
    grouped = convert_prequantized_state_dict(qsd)
    loaded = unflatten_params(grouped)
    np.testing.assert_array_equal(
        np.asarray(loaded["fc"]["weight"]["data"]),
        np.asarray(qparams["fc"]["weight"]["data"]),
    )
    y_loaded = model["fc"](loaded["fc"], x)
    np.testing.assert_array_equal(np.asarray(y_loaded), np.asarray(y_q))

    # detection + dequantize_weight fallback (used by state-dict export)
    children = {k[len("fc.weight."):]: v for k, v in qsd.items()
                if k.startswith("fc.weight.")}
    assert get_quant_type_from_children_dict(children) == "int8_w8a8"
    w_dq = dequantize_weight(qparams["fc"]["weight"], jnp.float32)
    rel_w = float(
        jnp.abs(w_dq - params["fc"]["weight"]).max()
        / (jnp.abs(params["fc"]["weight"]).max() + 1e-9)
    )
    assert w_dq.shape == (48, 64) and rel_w < 0.01


def test_fp4_differs_from_nf4():
    w = np.linspace(-1, 1, 128, dtype=np.float32).reshape(2, 64)
    p_nf4, _ = quantize_4bit(w, "nf4")
    p_fp4, _ = quantize_4bit(w, "fp4")
    assert not np.array_equal(p_nf4, p_fp4)


def test_quanto_int4_prequantized_round_trip():
    """quanto QBitsTensor on-disk layout (_data packed row pairs, _scale,
    _shift) loads through convert_prequantized_state_dict and matmuls close
    to the fp weight (reference quant/functional.py:294-298 detection)."""
    from vision_ft_tpu.modules.quant.functional import (
        convert_prequantized_state_dict,
        get_quant_type_from_children_dict,
        quantize_state_dict,
    )
    from vision_ft_tpu.nn.core import Linear, unflatten_params

    rng = np.random.default_rng(7)
    w = rng.standard_normal((32, 64)).astype(np.float32)
    sd = {"layer.weight": jnp.asarray(w), "layer.bias": jnp.zeros((32,))}
    qsd = quantize_state_dict(sd, "quanto_int4", include_keys=["layer"])
    assert set(qsd) == {"layer.weight._data", "layer.weight._scale",
                        "layer.weight._shift", "layer.bias"}
    assert qsd["layer.weight._data"].dtype == jnp.uint8
    assert qsd["layer.weight._data"].shape == (16, 64)
    # quanto PackedTensor layout: contiguous halves — row r pairs with
    # row r + R/2 (low|high nibble)
    import numpy as _np
    d0 = int(_np.asarray(qsd["layer.weight._data"])[0, 0])
    s = _np.asarray(qsd["layer.weight._scale"]).reshape(-1, 1)
    sh = _np.asarray(qsd["layer.weight._shift"]).reshape(-1, 1)
    q_full = _np.round((w + sh) / s).clip(0, 15).astype(_np.uint8)
    assert d0 == (q_full[0, 0] | (q_full[16, 0] << 4))
    assert get_quant_type_from_children_dict(
        {"_data": qsd["layer.weight._data"], "_scale": qsd["layer.weight._scale"],
         "_shift": qsd["layer.weight._shift"]}
    ) == "quanto_int4"

    params = unflatten_params(convert_prequantized_state_dict(qsd))
    lin = Linear(64, 32)
    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    y_q = lin(params["layer"], x)
    y_fp = lin({"weight": jnp.asarray(w), "bias": jnp.zeros((32,))}, x)
    rel = float(jnp.abs(y_q - y_fp).max() / (jnp.abs(y_fp).max() + 1e-9))
    assert rel < 0.25, rel


def test_quanto_int4_grouped_layout_dequantizes():
    """optimum-quanto's qint4 default is GROUP-wise quantization (axis=0
    group() = row-major reshape to (numel/gs, gs)); scale/shift are
    per-group. Loading such a checkpoint must reshape dq back to the
    logical weight shape (round-1 ADVICE finding)."""
    from vision_ft_tpu.modules.quant.functional import dequantize_weight

    rng = np.random.default_rng(11)
    out_f, in_f, gs = 8, 64, 16
    w = rng.standard_normal((out_f, in_f)).astype(np.float32)
    g = w.reshape(-1, gs)  # quanto group(axis=0): plain row-major reshape
    rmin, rmax = g.min(1, keepdims=True), g.max(1, keepdims=True)
    scale = np.maximum((rmax - rmin) / 15.0, 1e-12).astype(np.float32)
    shift = (-rmin).astype(np.float32)
    q = np.round((g + shift) / scale).clip(0, 15).astype(np.uint8)
    half = q.shape[0] // 2
    packed = (q[:half] | (q[half:] << 4)).astype(np.uint8)

    sub = {
        "data": jnp.asarray(packed),
        "scale": jnp.asarray(scale),
        "shift": jnp.asarray(shift),
    }
    dq = dequantize_weight(sub, jnp.float32, shape=(out_f, in_f))
    assert dq.shape == (out_f, in_f)
    expect = (q.astype(np.float32) * scale - shift).reshape(out_f, in_f)
    np.testing.assert_allclose(np.asarray(dq), expect, atol=1e-6)
    # quantization error itself is bounded by scale/2 per group
    assert np.abs(expect - w).max() <= (scale.max() / 2) + 1e-6

    # mismatched-numel subtree must fail loudly, not reshape garbage
    bad = dict(sub)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unsupported QBitsTensor"):
        dequantize_weight(bad, jnp.float32, shape=(out_f, in_f + 2))


def test_4bit_padded_and_odd_shapes_dequantize():
    """Shapes whose numel is not a multiple of bnb's pad unit (128) or
    whose K axis is odd: the split device layout must slice off bnb's pad
    bytes before repacking, and the blocksize must be INFERRED (a (10, 7)
    weight has 2 absmax blocks of 64 — ``numel // nblocks`` would read 35
    and scale the tail rows by the wrong block; regression for both)."""
    from vision_ft_tpu.modules.quant.functional import (
        dequantize_weight,
        quantize_weight,
    )
    from vision_ft_tpu.modules.quant.nf4 import infer_blocksize

    assert infer_blocksize(70, 2) == 64
    assert infer_blocksize(8192, 128) == 64
    assert infer_blocksize(8192, 64) == 128
    assert infer_blocksize(70, 1) == 128

    rng = np.random.default_rng(7)
    for shape in [(10, 6), (6, 10), (2, 4), (10, 7), (3, 3), (1, 2)]:
        w = rng.standard_normal(shape).astype(np.float32)
        sub = quantize_weight(w, "bnb_nf4")
        assert ("split" in sub) == (shape[1] % 2 == 0), shape
        deq = np.asarray(dequantize_weight(sub, jnp.float32, shape))
        # per-element NF4 error is <= absmax * (largest grid gap)/2 ~ 0.14;
        # a wrong-block scale (the regression) lands far outside this
        assert np.abs(deq - w).max() < 0.17 * np.abs(w).max() + 1e-6, shape


def test_nf4_text_encoder_forward():
    """The big text-encoder towers can run NF4-quantized (the single-chip
    posture for auraflow_nf4/flux_nf4 generate, where bf16 UMT5/T5-XXL
    doesn't fit HBM next to the quantized denoiser): quantizing the q/k/v/
    o + wi/wo Linears of a tiny UMT5 keeps the encoding close to bf16."""
    from vision_ft_tpu.models.text_encoders.umt5 import (
        UMT5Config,
        UMT5EncoderModel,
    )

    cfg = UMT5Config(vocab_size=128, d_model=64, d_kv=16, d_ff=128,
                     num_layers=2, num_heads=4)
    enc = UMT5EncoderModel(cfg)
    params = enc.init(jax.random.PRNGKey(0))
    qparams = quantize_params(
        params, "bnb_nf4",
        include_keys=["SelfAttention.q", "SelfAttention.k",
                      "SelfAttention.v", "SelfAttention.o",
                      "wi_0", "wi_1", "wo"],
    )
    # the embedding and relative-bias tables must stay unquantized
    assert "packed" not in str(jax.tree_util.tree_structure(qparams["shared"]))
    ids = jnp.asarray([[3, 5, 7, 2, 0, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.int32)
    y_fp = enc(params, ids, mask)
    y_q = enc(qparams, ids, mask)
    assert np.isfinite(np.asarray(y_q)).all()
    rel = float(jnp.abs(y_q - y_fp).max() / (jnp.abs(y_fp).max() + 1e-9))
    assert rel < 0.25, f"nf4 text encoder rel={rel}"
