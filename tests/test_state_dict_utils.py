"""Key-converter and key-targeting parity vs the PyTorch reference."""

import numpy as np
import torch

from reference_loader import import_reference

from vision_ft_tpu.models.sdxl import util as sdxl_util
from vision_ft_tpu.utils.state_dict import (
    RegexMatch,
    convert_open_clip_to_transformers,
    convert_transformers_to_open_clip,
    get_target_keys,
)

ref_util = import_reference("src.models.sdxl.util")
ref_sd = import_reference("src.utils.state_dict")


# A catalog of realistic sgm checkpoint keys covering every conversion rule.
ORIGINAL_KEYS = [
    "model.diffusion_model.input_blocks.0.0.weight",
    "model.diffusion_model.input_blocks.4.1.transformer_blocks.0.attn1.to_q.weight",
    "model.diffusion_model.input_blocks.4.1.proj_in.bias",
    "model.diffusion_model.middle_block.1.transformer_blocks.9.ff.net.2.weight",
    "model.diffusion_model.output_blocks.2.1.conv.weight",
    "model.diffusion_model.output_blocks.5.1.transformer_blocks.1.attn2.to_k.weight",
    "model.diffusion_model.time_embed.0.weight",
    "model.diffusion_model.label_emb.0.0.weight",
    "model.diffusion_model.out.0.weight",
    "conditioner.embedders.0.transformer.text_model.encoder.layers.3.self_attn.q_proj.weight",
    "conditioner.embedders.0.transformer.text_model.embeddings.token_embedding.weight",
    "conditioner.embedders.1.model.text_projection",
    "conditioner.embedders.1.model.ln_final.weight",
    "conditioner.embedders.1.model.transformer.resblocks.17.attn.in_proj_weight",
    "first_stage_model.decoder.conv_in.weight",
    "first_stage_model.decoder.mid.attn_1.q.weight",
    "first_stage_model.decoder.mid.block_1.norm1.weight",
    "first_stage_model.decoder.up.0.block.1.nin_shortcut.weight",
    "first_stage_model.decoder.up.3.upsample.conv.weight",
    "first_stage_model.encoder.down.2.downsample.conv.weight",
    "first_stage_model.encoder.down.0.block.0.conv1.weight",
    "first_stage_model.encoder.norm_out.weight",
    "first_stage_model.quant_conv.weight",
]


def test_convert_from_original_key_matches_reference():
    for key in ORIGINAL_KEYS:
        assert sdxl_util.convert_from_original_key(key) == ref_util.convert_from_original_key(
            key
        ), key


def test_round_trip_through_internal_layout():
    for key in ORIGINAL_KEYS:
        internal = sdxl_util.convert_from_original_key(key)
        assert sdxl_util.convert_to_original_key(internal) == key, key


def test_comfy_key_matches_reference():
    internal_keys = [sdxl_util.convert_from_original_key(k) for k in ORIGINAL_KEYS]
    for key in internal_keys:
        assert sdxl_util.convert_to_comfy_key(key) == ref_util.convert_to_comfy_key(key), key


def test_get_target_keys_matches_reference():
    keys = [
        "denoiser.input_blocks.blocks.4.1.transformer_blocks.0.attn1.to_q",
        "denoiser.input_blocks.blocks.4.1.transformer_blocks.0.attn2.to_k",
        "denoiser.middle_block.blocks.1.transformer_blocks.3.ff.net.2",
        "text_encoder.text_encoder_1.text_model.encoder.layers.0.mlp.fc1",
        "vae.decoder.mid_block.attentions.0.to_q",
    ]
    include = ["attn1", RegexMatch(regex=r".*\.attn2\..*")]
    exclude = ["to_k"]
    ref_include = ["attn1", ref_sd.RegexMatch(regex=r".*\.attn2\..*")]
    ref_exclude = ["to_k"]
    ours = set(get_target_keys(include, exclude, keys))
    theirs = set(ref_sd.get_target_keys(ref_include, ref_exclude, keys))
    assert ours == theirs
    assert ours == {"denoiser.input_blocks.blocks.4.1.transformer_blocks.0.attn1.to_q"}


def test_open_clip_conversion_matches_reference():
    torch.manual_seed(0)
    hidden = 8
    state = {
        "text_encoder_2.text_model.transformer.resblocks.0.attn.in_proj_weight": torch.randn(
            3 * hidden, hidden
        ),
        "text_encoder_2.text_model.transformer.resblocks.0.attn.in_proj_bias": torch.randn(
            3 * hidden
        ),
        "text_encoder_2.text_model.transformer.resblocks.0.attn.out_proj.weight": torch.randn(
            hidden, hidden
        ),
        "text_encoder_2.text_model.transformer.resblocks.0.ln_1.weight": torch.randn(hidden),
        "text_encoder_2.text_model.transformer.resblocks.0.mlp.c_fc.weight": torch.randn(
            4 * hidden, hidden
        ),
        "text_encoder_2.text_model.positional_embedding": torch.randn(77, hidden),
        "text_encoder_2.text_model.token_embedding.weight": torch.randn(100, hidden),
        "text_encoder_2.text_model.ln_final.bias": torch.randn(hidden),
        "text_encoder_2.text_model.logit_scale": torch.tensor(1.0),
    }
    theirs = ref_sd.convert_open_clip_to_transformers(state)
    ours = convert_open_clip_to_transformers({k: np.asarray(v) for k, v in state.items()})
    assert set(ours) == set(theirs)
    for k in theirs:
        np.testing.assert_allclose(np.asarray(ours[k]), theirs[k].numpy(), rtol=0, atol=0)

    # round trip back to open_clip layout
    back_theirs = ref_sd.convert_transformers_to_open_clip(theirs)
    back_ours = convert_transformers_to_open_clip(ours)
    assert set(back_ours) == set(back_theirs)
    for k in back_theirs:
        np.testing.assert_allclose(np.asarray(back_ours[k]), back_theirs[k].numpy())


def test_comfy_interop_structural_check(tmp_path):
    """tools/comfy_interop_check.py structural mode over a real exported
    comfy-key LoRA (the no-ComfyUI gate of reference tests/test_comfy.py)."""
    import numpy as np

    from tools.comfy_interop_check import load_lora_keys, structural_check
    from vision_ft_tpu.models.sdxl import util as sdxl_util
    from vision_ft_tpu.utils import safetensors as st

    internal = [
        "denoiser.input_blocks.blocks.4.1.transformer_blocks.0.attn1.to_q",
        "text_encoder.text_encoder_1.text_model.encoder.layers.0.self_attn.q_proj",
    ]
    sd = {}
    for root in internal:
        comfy_root = sdxl_util.convert_to_comfy_key(root)
        sd[f"{comfy_root}.lora_down.weight"] = np.zeros((4, 8), np.float32)
        sd[f"{comfy_root}.lora_up.weight"] = np.zeros((8, 4), np.float32)
        sd[f"{comfy_root}.alpha"] = np.asarray(4.0, np.float32)
    path = str(tmp_path / "lora_comfy.safetensors")
    st.save_file(sd, path)
    keys = load_lora_keys(path)
    assert structural_check(keys) == []

    # an unconverted internal key must be flagged
    bad = dict(sd)
    bad["denoiser.middle_block.attn1.to_k.lora_down.weight"] = np.zeros((4, 8), np.float32)
    st.save_file(bad, path)
    problems = structural_check(load_lora_keys(path))
    assert problems and "internal" in problems[0]

    # a dangling lora_down (missing lora_up) must be flagged
    dangling = {
        "diffusion_model.middle_block.1.attn1.to_q.lora_down.weight":
            np.zeros((4, 8), np.float32),
    }
    st.save_file(dangling, path)
    problems = structural_check(load_lora_keys(path))
    assert any("without lora_up" in p for p in problems)
