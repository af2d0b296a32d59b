"""CLIP text tower parity vs HF transformers (tiny config, fp32, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_ft_tpu.models.text_encoders import (
    CLIPTextConfig,
    CLIPTextModel,
    CLIPTextModelWithProjection,
)
from vision_ft_tpu.nn import flatten_params, unflatten_params

TINY = dict(
    vocab_size=1000,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=3,
    num_attention_heads=4,
    max_position_embeddings=77,
    projection_dim=48,
)


def _hf_model(with_projection: bool, hidden_act: str):
    import torch
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel
    from transformers import CLIPTextModelWithProjection as HFProjModel

    torch.manual_seed(0)
    config = HFConfig(**TINY, hidden_act=hidden_act, eos_token_id=2, bos_token_id=0)
    model = (HFProjModel if with_projection else HFModel)(config).eval()
    return torch, model


@pytest.mark.parametrize(
    "with_projection,hidden_act", [(False, "quick_gelu"), (True, "gelu")]
)
def test_clip_parity(with_projection, hidden_act):
    torch, hf = _hf_model(with_projection, hidden_act)
    config = CLIPTextConfig(**TINY, hidden_act=hidden_act)
    jx = (CLIPTextModelWithProjection if with_projection else CLIPTextModel)(config)

    hf_sd = {k: v for k, v in hf.state_dict().items() if "position_ids" not in k}
    jax_keys = set(flatten_params(jx.init(jax.random.key(0))))
    assert jax_keys == set(hf_sd.keys())

    params = unflatten_params({k: jnp.asarray(v.numpy()) for k, v in hf_sd.items()})

    rng = np.random.default_rng(7)
    ids = rng.integers(3, TINY["vocab_size"], size=(2, 77))
    ids[:, 0] = 0
    ids[0, 20:] = 999  # "eos" = max token id at position 20
    ids[1, 50:] = 999

    with torch.no_grad():
        out = hf(torch.from_numpy(ids), output_hidden_states=True)
    ref_last = out.last_hidden_state.numpy()
    ref_penult = out.hidden_states[-2].numpy()
    ref_pooled = (
        out.text_embeds.numpy() if with_projection else out.pooler_output.numpy()
    )

    last, penult, pooled = jx(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(last), ref_last, atol=2e-5)
    np.testing.assert_allclose(np.asarray(penult), ref_penult, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled, atol=2e-5)
