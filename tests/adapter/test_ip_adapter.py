"""IP-Adapter: variants apply + generate, adapter checkpoint round trip
(model: reference tests/adapter/test_ip_adapter.py:22-476)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")

from vision_ft_tpu.models.autoencoder import AutoencoderKLConfig
from vision_ft_tpu.models.sdxl.adapter.ip_adapter import (
    SDXLModelWithIPAdapter,
    SDXLModelWithIPAdapterConfig,
)
from vision_ft_tpu.models.sdxl.config import DenoiserConfig
from vision_ft_tpu.models.text_encoders import CLIPTextConfig
from vision_ft_tpu.modules.adapter.ip_adapter.projectors import (
    ImageTextProjector,
    LinearImageProjector,
    MLPImageProjector,
    ResamplerProjector,
    detect_projector_type,
    load_projector_from_state_dict,
)
from vision_ft_tpu.nn import flatten_params


class MockTokenizer:
    bos_token_id = 0
    eos_token_id = 999
    pad_token_id = 999

    def __call__(self, prompts, max_length=None, **kw):
        rows = []
        for p in prompts:
            ids = [3 + (hash(w) % 900) for w in p.split()][: max_length - 2]
            row = [0, *ids, 999]
            row += [999] * (max_length - len(row))
            rows.append(row)
        return np.asarray(rows, dtype=np.int32)


def mock_image_encoder(pixel_values):
    """(B, H, W, C) -> (B, 96) deterministic pooled features (the mlp/linear
    projectors consume pooled features like the reference's pooler_output)."""
    arr = np.asarray(pixel_values, np.float32)
    b = arr.shape[0]
    pooled = arr.reshape(b, -1)
    rng = np.random.default_rng(0)
    proj = rng.standard_normal((pooled.shape[1], 96)).astype(np.float32) * 0.01
    return pooled @ proj


def _model(variant="original", projector="mlp"):
    config = SDXLModelWithIPAdapterConfig(
        checkpoint_path="unused",
        dtype="float32",
        denoiser=DenoiserConfig(
            hidden_dim=32, num_head_channels=8, context_dim=112,
            block_out_channels=[32, 64, 64], num_transformers_per_block=[1, 1, 1],
        ),
        adapter={
            "variant": variant,
            "projector_type": projector,
            "num_ip_tokens": 4,
            "feature_dim": 96,
            "image_size": 32,
            "dtype": "float32",
            **({"peft": {"type": "lora", "rank": 2, "dtype": "float32"}}
               if variant == "peft" else {}),
        },
    )
    model = SDXLModelWithIPAdapter(
        config,
        image_encoder=mock_image_encoder,
        tokenizer=MockTokenizer(),
        vae_config=AutoencoderKLConfig(
            block_out_channels=(8, 8, 16, 16), latent_channels=4, norm_num_groups=4
        ),
        text_encoder_config_1=CLIPTextConfig(
            vocab_size=1000, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, hidden_act="quick_gelu",
        ),
        text_encoder_config_2=CLIPTextConfig(
            vocab_size=1000, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, hidden_act="gelu",
            projection_dim=1280,
        ),
    )
    model.init_params(jax.random.PRNGKey(0))
    model.init_adapter_params(jax.random.PRNGKey(1))
    return model


def test_attn2_paths_odd_indexing():
    model = _model()
    paths = model.manager.target_paths
    assert len(paths) > 0
    assert all(p.endswith(".attn2") for p in paths)
    sd = model.manager.get_state_dict(model.params["denoiser"])
    # odd disk indices only (reference ip_adapter/__init__.py:107-121)
    indices = sorted({int(k.split(".")[1]) for k in sd})
    assert indices == [2 * i + 1 for i in range(len(paths))]
    assert any(k.endswith("to_k_ip.weight") for k in sd)


def test_adapter_init_copies_base_weights():
    model = _model()
    flat = flatten_params(model.params["denoiser"])
    path = model.manager.target_paths[0]
    np.testing.assert_array_equal(
        np.asarray(flat[f"{path}.to_k_ip.weight"]),
        np.asarray(flat[f"{path}.to_k.weight"]),
    )


@pytest.mark.parametrize("variant", ["original", "tanh_gate", "gate", "flamingo",
                                     "time_gate", "adaln_zero", "peft"])
def test_variants_generate(variant):
    from PIL import Image

    model = _model(variant)
    ref = Image.new("RGB", (40, 40), (200, 30, 30))
    images = model.generate(
        "a cat", reference_image=ref, width=32, height=32,
        num_inference_steps=2, cfg_scale=2.0, seed=0,
    )
    assert len(images) == 1 and images[0].size == (32, 32)


def test_generate_without_reference_image():
    model = _model()
    images = model.generate(
        "a cat", width=32, height=32, num_inference_steps=2, cfg_scale=2.0, seed=0
    )
    assert len(images) == 1
    # no NaNs leaked (fully-masked ip attention must yield 0, not NaN)
    assert np.asarray(images[0]).max() >= 0


def test_adapter_state_dict_round_trip():
    model = _model("tanh_gate")
    sd = model.get_adapter_state_dict()
    assert any(k.startswith("image_proj.") for k in sd)
    assert any(k.endswith(".tanh_gate.weight") for k in sd)

    model2 = _model("tanh_gate")
    # perturb then load back
    sd_perturbed = {k: v + 1.0 for k, v in sd.items()}
    model2.load_adapter_params(sd_perturbed)
    sd2 = model2.get_adapter_state_dict()
    for k in sd:
        np.testing.assert_allclose(np.asarray(sd2[k]), np.asarray(sd[k]) + 1.0)


def test_projector_shapes_and_detection():
    key = jax.random.PRNGKey(0)
    feats_seq = jnp.ones((2, 16, 96))
    feats_flat = jnp.ones((2, 96))

    linear = LinearImageProjector(96, 112, 4)
    p = linear.init(key)
    assert linear(p, feats_flat).shape == (2, 4, 112)
    assert detect_projector_type(flatten_params(p)) == "linear"

    mlp = MLPImageProjector(96, 1.0, 112, 4)
    p = mlp.init(key)
    assert mlp(p, feats_flat).shape == (2, 4, 112)
    assert detect_projector_type(flatten_params(p)) == "mlp"

    resampler = ResamplerProjector(96, num_heads=4, cross_attention_dim=112,
                                   num_ip_tokens=4, depth=2)
    p = resampler.init(key)
    assert resampler(p, feats_seq).shape == (2, 4, 112)
    flat = flatten_params(p)
    assert detect_projector_type(flat) == "resampler"
    cfg = ResamplerProjector.config_from_pretrained(flat, num_heads=4)
    assert cfg["depth"] == 2 and cfg["num_ip_tokens"] == 4

    text_seq = jnp.ones((2, 7, 80))
    image_text = ImageTextProjector(96, 80, 112, num_heads=4, num_blocks=2,
                                    mlp_ratio=2.0, num_ip_tokens=4)
    p = image_text.init(key)
    assert image_text(p, feats_seq, text_seq).shape == (2, 4, 112)
    flat = flatten_params(p)
    assert detect_projector_type(flat) == "image_text"
    cfg = ImageTextProjector.config_from_pretrained(flat, num_heads=4)
    assert cfg == dict(image_dim=96, text_dim=80, hidden_dim=112, num_heads=4,
                       num_blocks=2, mlp_ratio=2.0, num_ip_tokens=4)


def test_load_projector_from_state_dict_all_types():
    """detect -> build -> load for every projector type, so a detect/build
    skew (round-2 image_text late-failure) breaks CI (reference
    ip_adapter/__init__.py:216-246)."""
    key = jax.random.PRNGKey(7)
    cases = [
        (LinearImageProjector(96, 112, 4), "linear", (jnp.ones((2, 96)),)),
        (MLPImageProjector(96, 1.0, 112, 4), "mlp", (jnp.ones((2, 96)),)),
        (ResamplerProjector(96, num_heads=4, cross_attention_dim=112,
                            num_ip_tokens=4, depth=2),
         "resampler", (jnp.ones((2, 16, 96)),)),
        (ImageTextProjector(96, 80, 112, num_heads=4, num_blocks=2, num_ip_tokens=4),
         "image_text", (jnp.ones((2, 16, 96)), jnp.ones((2, 7, 80)))),
    ]
    for module, expected_type, inputs in cases:
        params = module.init(key)
        flat = dict(flatten_params(params))
        assert detect_projector_type(flat) == expected_type
        loaded_module, loaded_params = load_projector_from_state_dict(flat, num_heads=4)
        assert type(loaded_module) is type(module)
        np.testing.assert_allclose(
            np.asarray(loaded_module(loaded_params, *inputs)),
            np.asarray(module(params, *inputs)),
        )


def test_image_text_projector_torch_parity():
    """Golden parity vs the live torch reference module
    (reference ip_adapter/image_text.py:282-440)."""
    torch = pytest.importorskip("torch")
    from reference_loader import import_reference

    image_text = import_reference("src.modules.adapter.ip_adapter.image_text")
    # the reference wrapper force-casts fp32 attention to bf16 for speed
    # (src/modules/attention.py:106-118); bypass for a tight fp32 golden
    image_text.scaled_dot_product_attention = (
        lambda q, k, v, **kw: torch.nn.functional.scaled_dot_product_attention(q, k, v)
    )
    ref = image_text.ImageTextProjector(
        image_dim=96, text_dim=80, hidden_dim=64, num_heads=4,
        num_blocks=2, mlp_ratio=2.0, num_ip_tokens=4,
    )
    ref = ref.float().eval()
    flat = {k: jnp.asarray(v.detach().float().numpy()) for k, v in ref.state_dict().items()}
    module, params = load_projector_from_state_dict(flat, num_heads=4)
    assert isinstance(module, ImageTextProjector)

    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 16, 96)).astype(np.float32)
    txt = rng.standard_normal((2, 7, 80)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(img), torch.from_numpy(txt)).numpy()
    out = np.asarray(module(params, jnp.asarray(img), jnp.asarray(txt)))
    assert out.shape == ref_out.shape == (2, 4, 64)
    np.testing.assert_allclose(out, ref_out, atol=3e-5, rtol=1e-4)


def test_image_text_generate():
    """e2e generate with the image_text projector: the prompt embeddings
    flow into the projector alongside sequence image features."""
    from PIL import Image

    def seq_image_encoder(pixel_values):
        arr = np.asarray(pixel_values, np.float32)
        b = arr.shape[0]
        flat = arr.reshape(b, -1)
        rng = np.random.default_rng(0)
        proj = rng.standard_normal((flat.shape[1], 16 * 96)).astype(np.float32) * 0.01
        return (flat @ proj).reshape(b, 16, 96)

    config = SDXLModelWithIPAdapterConfig(
        checkpoint_path="unused",
        dtype="float32",
        denoiser=DenoiserConfig(
            hidden_dim=32, num_head_channels=8, context_dim=112,
            block_out_channels=[32, 64, 64], num_transformers_per_block=[1, 1, 1],
        ),
        adapter={
            "variant": "original",
            "projector_type": "image_text",
            "projector_args": {"text_dim": 112, "num_heads": 4, "depth": 1},
            "num_ip_tokens": 4,
            "feature_dim": 96,
            "image_size": 32,
            "dtype": "float32",
        },
    )
    model = SDXLModelWithIPAdapter(
        config,
        image_encoder=seq_image_encoder,
        tokenizer=MockTokenizer(),
        vae_config=AutoencoderKLConfig(
            block_out_channels=(8, 8, 16, 16), latent_channels=4, norm_num_groups=4
        ),
        text_encoder_config_1=CLIPTextConfig(
            vocab_size=1000, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, hidden_act="quick_gelu",
        ),
        text_encoder_config_2=CLIPTextConfig(
            vocab_size=1000, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, hidden_act="gelu",
            projection_dim=1280,
        ),
    )
    model.init_params(jax.random.PRNGKey(0))
    model.init_adapter_params(jax.random.PRNGKey(1))
    assert isinstance(model.image_proj, ImageTextProjector)

    ref = Image.new("RGB", (40, 40), (40, 120, 200))
    images = model.generate(
        "a dog", reference_image=ref, width=32, height=32,
        num_inference_steps=2, cfg_scale=2.0, seed=0,
    )
    assert len(images) == 1 and images[0].size == (32, 32)
