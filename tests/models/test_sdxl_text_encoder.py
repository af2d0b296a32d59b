"""Long-prompt chunking + SDXL dual-encoder parity vs the torch reference."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
from reference_loader import import_reference

from vision_ft_tpu.models.sdxl.text_encoder import TextEncoder
from vision_ft_tpu.models.text_encoders import CLIPTextConfig
from vision_ft_tpu.modules.long_prompt import tokenize_long_prompt
from vision_ft_tpu.nn import flatten_params, unflatten_params

BOS, EOS = 0, 999  # eos must be the max id (CLIP pooling = argmax position)
VOCAB = 1000

TINY_1 = dict(
    vocab_size=VOCAB,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    projection_dim=32,
)
TINY_2 = dict(
    vocab_size=VOCAB,
    hidden_size=48,
    intermediate_size=96,
    num_hidden_layers=3,
    num_attention_heads=4,
    projection_dim=40,
)


class MockTokenizer:
    """Deterministic 'tokenizer': hash each word to an id. Implements both
    the HF call convention (return .input_ids torch tensor) and ours."""

    bos_token_id = BOS
    eos_token_id = EOS
    pad_token_id = EOS

    def _encode(self, text):
        return [3 + (hash(w) % (VOCAB - 10)) for w in text.split()]

    def _rows(self, prompts, max_length):
        rows = []
        for p in prompts:
            ids = self._encode(p)[: max_length - 2]
            row = [BOS, *ids, EOS]
            row += [self.pad_token_id] * (max_length - len(row))
            rows.append(row)
        return rows

    def __call__(self, prompts, max_length=None, return_tensors=None, **kw):
        rows = self._rows(prompts, max_length)
        if return_tensors == "pt":
            import torch

            class Enc:
                pass

            enc = Enc()
            enc.input_ids = torch.tensor(rows)
            return enc
        return np.asarray(rows, dtype=np.int32)


def test_tokenize_long_prompt_parity():
    ref_lp = import_reference("src.modules.long_prompt")
    tok = MockTokenizer()
    prompts = ["a cat " * 60, "short prompt", ""]
    ref_ids, ref_mask = ref_lp.tokenize_long_prompt(tok, prompts, 225, 75)
    ids, mask = tokenize_long_prompt(tok, prompts, 225, 75)
    np.testing.assert_array_equal(ids, ref_ids.numpy())
    np.testing.assert_array_equal(mask, ref_mask.numpy())


@pytest.fixture(scope="module")
def ref_text_encoder():
    import torch
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel
    from transformers import CLIPTextModelWithProjection as HFProj

    ref_te = import_reference("src.models.sdxl.text_encoder")
    torch.manual_seed(0)
    te1 = HFModel(
        HFConfig(**TINY_1, hidden_act="quick_gelu", eos_token_id=2, max_position_embeddings=77)
    ).eval()
    te2 = HFProj(
        HFConfig(**TINY_2, hidden_act="gelu", eos_token_id=2, max_position_embeddings=77)
    ).eval()
    model = ref_te.TextEncoder(te1, MockTokenizer(), te2, MockTokenizer())
    return torch, model


def test_encode_prompts_parity(ref_text_encoder):
    torch, ref = ref_text_encoder

    jx = TextEncoder(
        tokenizer=MockTokenizer(),
        config_1=CLIPTextConfig(**TINY_1, hidden_act="quick_gelu"),
        config_2=CLIPTextConfig(**TINY_2, hidden_act="gelu"),
    )
    sd1 = {
        f"text_encoder_1.{k}": jnp.asarray(v.numpy())
        for k, v in ref.text_encoder_1.state_dict().items()
        if "position_ids" not in k
    }
    sd2 = {
        f"text_encoder_2.{k}": jnp.asarray(v.numpy())
        for k, v in ref.text_encoder_2.state_dict().items()
        if "position_ids" not in k
    }
    params = unflatten_params({**sd1, **sd2})
    assert set(flatten_params(jx.init(jax.random.key(0)))) == set(sd1) | set(sd2)

    prompts = ["a photo of a cat sitting on " + "very " * 80 + "long mat", "dog!"]
    negatives = ["blurry, low quality"]

    with torch.no_grad():
        ref_out = ref.encode_prompts(prompts, negatives, use_negative_prompts=True)
    out = jx.encode_prompts(params, prompts, negatives, use_negative_prompts=True)

    for got, want in [
        (out.text_encoder_1.positive_embeddings, ref_out.text_encoder_1.positive_embeddings),
        (out.text_encoder_1.negative_embeddings, ref_out.text_encoder_1.negative_embeddings),
        (out.text_encoder_2.positive_embeddings, ref_out.text_encoder_2.positive_embeddings),
        (out.text_encoder_2.negative_embeddings, ref_out.text_encoder_2.negative_embeddings),
        (
            out.text_encoder_2.pooled_positive_embeddings,
            ref_out.text_encoder_2.pooled_positive_embeddings,
        ),
        (
            out.text_encoder_2.pooled_negative_embeddings,
            ref_out.text_encoder_2.pooled_negative_embeddings,
        ),
    ]:
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=3e-5)

    np.testing.assert_array_equal(
        np.asarray(out.text_encoder_1.positive_attention_mask),
        ref_out.text_encoder_1.positive_attention_mask.numpy(),
    )
