"""Ring (context-parallel) attention over a mesh sequence axis.

The sequence-parallel extension the blockwise flash kernel was designed
for (SURVEY.md §5.7: "design the kernel so a ring/CP extension is
possible" — the reference has no sequence parallelism of any kind; this
goes beyond it). Layout: q, k, v are (B, H, S, D) with S sharded over a
mesh axis; each device computes flash attention of its local queries
against the resident K/V shard, then rotates K/V one neighbor along the
ring with ``lax.ppermute`` and folds the new partial in with a stable
log-sum-exp merge — exact full-sequence softmax attention without any
device ever holding the whole sequence, and every hop rides the ICI
ring.

Differentiable by construction (the per-shard attention carries the
Pallas custom VJP on TPU; the lse merge and ppermute are plain traceable
ops), so jax autodiff gives the context-parallel backward, with per-hop
residuals rematerializable under jax.checkpoint.

Parity is tested on the 8-device virtual CPU mesh
(tests/ops/test_ring_attention.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def _local_partial(q, k, v, scale, _force_pallas=False):
    """Normalized attention of q against one K/V shard plus the row
    log-sum-exp — the pair the ring merge needs.

    TPU: ``flash_attention_with_lse`` — the padded, custom-VJP Pallas
    entry (shard lengths need not be block multiples, and the lse
    cotangent from the merge flows back through it). Elsewhere: an
    explicit-logits reference path (tests run on the CPU mesh; the
    Pallas path is grad-tested in interpret mode)."""
    if jax.default_backend() == "tpu" or _force_pallas:
        from .pallas.flash_attention import flash_attention_with_lse

        o, lse = flash_attention_with_lse(
            q, k, v, scale=scale, interpret=_force_pallas
        )
        return o.astype(jnp.float32), lse
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.maximum(jnp.sum(p, axis=-1), 1e-30)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)) / l[..., None]
    return out, m[..., 0] + jnp.log(l)


def _merge(out_a, lse_a, out_b, lse_b):
    """Combine two normalized partials: softmax(A ∪ B) out of
    softmax(A), softmax(B) via their log-sum-exps."""
    lse = jnp.logaddexp(lse_a, lse_b)
    return (
        out_a * jnp.exp(lse_a - lse)[..., None]
        + out_b * jnp.exp(lse_b - lse)[..., None],
        lse,
    )


def ring_attention_sharded(q, k, v, scale: float, axis_name: str):
    """The shard_map body: local (B, H, S_local, D) shards in, the
    full-sequence attention rows for the local queries out."""
    n = lax.psum(1, axis_name)
    out, lse = _local_partial(q, k, v, scale)

    def body(_, carry):
        out, lse, k_cur, v_cur = carry
        perm = [(j, (j + 1) % n) for j in range(n)]
        k_cur = lax.ppermute(k_cur, axis_name, perm)
        v_cur = lax.ppermute(v_cur, axis_name, perm)
        out_i, lse_i = _local_partial(q, k_cur, v_cur, scale)
        out, lse = _merge(out, lse, out_i, lse_i)
        return out, lse, k_cur, v_cur

    out, lse, _, _ = lax.fori_loop(0, n - 1, body, (out, lse, k, v))
    return out.astype(q.dtype)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis_name: str = "sp",
    scale: Optional[float] = None,
) -> jax.Array:
    """Context-parallel attention: (B, H, S, D) with S sharded over
    ``mesh[axis_name]``. Returns the full-attention result with the same
    sharding. S must divide evenly by the ring size."""
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map

    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = mesh.shape[axis_name]
    assert q.shape[2] % n == 0, "sequence must divide the ring size"

    spec = P(None, None, axis_name, None)
    fn = shard_map(
        partial(ring_attention_sharded, scale=scale, axis_name=axis_name),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
