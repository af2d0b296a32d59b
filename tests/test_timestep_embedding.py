"""Timestep sinusoid embedding parity vs the reference implementation."""

import jax.numpy as jnp
import numpy as np
import torch

from reference_loader import import_reference

from vision_ft_tpu.modules.timestep.embedding import get_timestep_embedding

ref = import_reference("src.modules.timestep.embedding")


def test_timestep_embedding_matches_reference():
    timesteps = np.array([0.0, 1.0, 17.5, 999.0], dtype=np.float32)
    for dim in (320, 256, 13):
        for flip in (False, True):
            for shift in (0.0, 1.0):
                expected = ref.get_timestep_embedding(
                    torch.from_numpy(timesteps),
                    embedding_dim=dim,
                    flip_sin_to_cos=flip,
                    downscale_freq_shift=shift,
                ).numpy()
                got = get_timestep_embedding(
                    jnp.asarray(timesteps),
                    embedding_dim=dim,
                    flip_sin_to_cos=flip,
                    downscale_freq_shift=shift,
                )
                # atol: fp32 exp/sin ulp differences between XLA and libm get
                # amplified by large angles (sin(t*f) with t≈1000); this is
                # cross-framework jitter, far inside the 1e-2 latent budget.
                np.testing.assert_allclose(np.asarray(got), expected, atol=5e-3)


def test_attention_matches_torch_sdpa():
    import torch.nn.functional as F

    from vision_ft_tpu.ops import scaled_dot_product_attention

    torch.manual_seed(0)
    q = torch.randn(2, 4, 9, 8)
    k = torch.randn(2, 4, 13, 8)
    v = torch.randn(2, 4, 13, 8)
    expected = F.scaled_dot_product_attention(q, k, v).numpy()
    got = scaled_dot_product_attention(
        jnp.asarray(q.numpy()), jnp.asarray(k.numpy()), jnp.asarray(v.numpy())
    )
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)

    # boolean mask + causal
    mask = torch.rand(2, 1, 9, 13) > 0.3
    expected = F.scaled_dot_product_attention(q, k, v, attn_mask=mask).numpy()
    got = scaled_dot_product_attention(
        jnp.asarray(q.numpy()),
        jnp.asarray(k.numpy()),
        jnp.asarray(v.numpy()),
        mask=jnp.asarray(mask.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)

    q2 = torch.randn(2, 4, 13, 8)
    expected = F.scaled_dot_product_attention(q2, k, v, is_causal=True).numpy()
    got = scaled_dot_product_attention(
        jnp.asarray(q2.numpy()),
        jnp.asarray(k.numpy()),
        jnp.asarray(v.numpy()),
        is_causal=True,
    )
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)
