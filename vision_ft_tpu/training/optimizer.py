"""Optimizer factory.

The reference resolves optimizers by dotted import string
(/root/reference/src/optimizer/util.py:6-31, e.g. "torch.optim.AdamW",
"schedulefree.RAdamScheduleFree", "bitsandbytes.optim.AdamW8bit"). The TPU
build keeps the same config strings but resolves them to **optax**
gradient transformations, so reference YAMLs run unchanged:

  torch.optim.AdamW            -> optax.adamw
  torch.optim.Adam             -> optax.adam
  torch.optim.SGD              -> optax.sgd
  torch.optim.RMSprop          -> optax.rmsprop
  torch.optim.Adafactor        -> optax.adafactor
  schedulefree.*ScheduleFree   -> optax.contrib.schedule_free_adamw
  bitsandbytes.optim.AdamW8bit -> blockwise int8-state AdamW (adamw_8bit)
  optax.<name>                 -> resolved on optax directly

Schedule-free optimizers need params transformed for evaluation; the
trainer mirrors the reference's optimizer.train()/.eval() calls
(src/trainer/common.py:257-276) via :func:`eval_params`.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

ScheduleOrFloat = float | Callable[[jax.Array], jax.Array]


def _adamw(lr: ScheduleOrFloat, args: dict) -> optax.GradientTransformation:
    return optax.adamw(
        lr,
        b1=args.get("betas", (0.9, 0.999))[0],
        b2=args.get("betas", (0.9, 0.999))[1],
        eps=args.get("eps", 1e-8),
        weight_decay=args.get("weight_decay", 0.01),
    )


def _adam(lr: ScheduleOrFloat, args: dict) -> optax.GradientTransformation:
    return optax.adam(
        lr,
        b1=args.get("betas", (0.9, 0.999))[0],
        b2=args.get("betas", (0.9, 0.999))[1],
        eps=args.get("eps", 1e-8),
    )


def _sgd(lr: ScheduleOrFloat, args: dict) -> optax.GradientTransformation:
    return optax.sgd(lr, momentum=args.get("momentum"), nesterov=args.get("nesterov", False))


def _rmsprop(lr: ScheduleOrFloat, args: dict) -> optax.GradientTransformation:
    return optax.rmsprop(
        lr,
        decay=args.get("alpha", 0.99),
        eps=args.get("eps", 1e-8),
        momentum=args.get("momentum", 0.0),
    )


def _adafactor(lr: ScheduleOrFloat, args: dict) -> optax.GradientTransformation:
    return optax.adafactor(learning_rate=lr)


def _schedule_free_adamw(lr: ScheduleOrFloat, args: dict) -> optax.GradientTransformation:
    base = float(lr(0)) if callable(lr) else float(lr)
    return optax.contrib.schedule_free_adamw(
        learning_rate=base,
        b1=args.get("betas", (0.9, 0.999))[0],
        b2=args.get("betas", (0.9, 0.999))[1],
        weight_decay=args.get("weight_decay", 0.0),
        warmup_steps=args.get("warmup_steps", 0),
    )


def adamw_8bit(
    lr: ScheduleOrFloat,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.01,
    block_size: int = 2048,
) -> optax.GradientTransformation:
    """AdamW with int8 blockwise-quantized moments — the optax equivalent of
    bitsandbytes.optim.AdamW8bit (dynamic-range quantization with per-block
    absmax scales; the reference config uses it at
    configs/sdxl/text_to_image_lora.yml:42).

    Moments are stored int8 + fp32 per-block scales; (de)quantization happens
    in-register inside the fused update, so HBM traffic for optimizer state
    drops ~4x vs fp32 Adam. The first moment uses signed linear absmax
    quantization; the second (non-negative, huge dynamic range) is quantized
    in sqrt-domain — the same dynamic-range fix bnb's nonlinear 8-bit map
    provides.
    """

    _MU = 255.0
    _LOG1P_MU = math.log1p(_MU)

    def _blocks(x: jax.Array) -> jax.Array:
        flat = x.reshape(-1)
        pad = (-flat.size) % block_size
        flat = jnp.pad(flat, (0, pad))
        return flat.reshape(-1, block_size)

    def _compand(n: jax.Array) -> jax.Array:
        # µ-law: uniform *relative* error across magnitudes (the property
        # bnb's dynamic 8-bit map provides).
        return jnp.sign(n) * jnp.log1p(_MU * jnp.abs(n)) / _LOG1P_MU

    def _expand_(y: jax.Array) -> jax.Array:
        return jnp.sign(y) * jnp.expm1(jnp.abs(y) * _LOG1P_MU) / _MU

    def _quantize(x: jax.Array) -> tuple[jax.Array, jax.Array]:
        blocks = _blocks(x)
        scale = jnp.maximum(jnp.max(jnp.abs(blocks), axis=1, keepdims=True), 1e-12)
        q = jnp.round(_compand(blocks / scale) * 127.0).astype(jnp.int8)
        return q, scale.astype(jnp.float32)

    def _dequantize(q: jax.Array, scale: jax.Array, shape, size: int) -> jax.Array:
        flat = (_expand_(q.astype(jnp.float32) / 127.0) * scale).reshape(-1)[:size]
        return flat.reshape(shape)

    def _quantize_sqrt(x: jax.Array) -> tuple[jax.Array, jax.Array]:
        root = jnp.sqrt(_blocks(x))
        scale = jnp.maximum(jnp.max(root, axis=1, keepdims=True), 1e-12)
        q = (jnp.round(_compand(root / scale) * 255.0) - 128.0).astype(jnp.int8)
        return q, scale.astype(jnp.float32)

    def _dequantize_sqrt(q: jax.Array, scale: jax.Array, shape, size: int) -> jax.Array:
        root = _expand_((q.astype(jnp.float32) + 128.0) / 255.0) * scale
        return jnp.square(root).reshape(-1)[:size].reshape(shape)

    def init(params):
        def zeros(x):
            q, s = _quantize(jnp.zeros_like(x, dtype=jnp.float32))
            return {"q": q, "scale": s}

        return {
            "mu": jax.tree.map(zeros, params),
            "nu": jax.tree.map(zeros, params),
            "count": jnp.zeros([], jnp.int32),
        }

    def update(grads, state, params=None):
        count = state["count"] + 1
        lr_t = lr(count) if callable(lr) else lr

        is_first = count == 1

        def one(g, mu_q, nu_q, p):
            g = g.astype(jnp.float32)
            mu = _dequantize(mu_q["q"], mu_q["scale"], g.shape, g.size)
            # nu was stored sqrt-domain except the all-zeros init state
            nu = jnp.where(
                is_first,
                jnp.zeros(g.shape, jnp.float32),
                _dequantize_sqrt(nu_q["q"], nu_q["scale"], g.shape, g.size),
            )
            mu = b1 * mu + (1 - b1) * g
            nu = b2 * nu + (1 - b2) * jnp.square(g)
            mu_hat = mu / (1 - b1 ** count.astype(jnp.float32))
            nu_hat = nu / (1 - b2 ** count.astype(jnp.float32))
            step = mu_hat / (jnp.sqrt(nu_hat) + eps)
            if weight_decay:
                step = step + weight_decay * p.astype(jnp.float32)
            upd = (-lr_t * step).astype(p.dtype)
            mq, ms = _quantize(mu)
            nq, ns = _quantize_sqrt(nu)
            return upd, {"q": mq, "scale": ms}, {"q": nq, "scale": ns}

        flat_g, treedef = jax.tree.flatten(grads)
        flat_mu = treedef.flatten_up_to(state["mu"])
        flat_nu = treedef.flatten_up_to(state["nu"])
        flat_p = treedef.flatten_up_to(params)
        out = [one(g, m, n, p) for g, m, n, p in zip(flat_g, flat_mu, flat_nu, flat_p)]
        updates = treedef.unflatten([o[0] for o in out])
        new_mu = treedef.unflatten([o[1] for o in out])
        new_nu = treedef.unflatten([o[2] for o in out])
        return updates, {"mu": new_mu, "nu": new_nu, "count": count}

    return optax.GradientTransformation(init, update)


_REGISTRY: dict[str, Callable[[ScheduleOrFloat, dict], optax.GradientTransformation]] = {
    "torch.optim.adamw": _adamw,
    "adamw": _adamw,
    "torch.optim.adam": _adam,
    "adam": _adam,
    "torch.optim.sgd": _sgd,
    "sgd": _sgd,
    "torch.optim.rmsprop": _rmsprop,
    "torch.optim.adafactor": _adafactor,
    "adafactor": _adafactor,
    "schedulefree.adamwschedulefree": _schedule_free_adamw,
    "schedulefree.radamschedulefree": _schedule_free_adamw,
    "schedulefree.sgdschedulefree": lambda lr, a: optax.contrib.schedule_free_sgd(
        learning_rate=float(lr(0)) if callable(lr) else float(lr)
    ),
    "bitsandbytes.optim.adamw8bit": lambda lr, a: adamw_8bit(
        lr,
        b1=a.get("betas", (0.9, 0.999))[0],
        b2=a.get("betas", (0.9, 0.999))[1],
        eps=a.get("eps", 1e-8),
        weight_decay=a.get("weight_decay", 0.01),
    ),
    "bitsandbytes.optim.adam8bit": lambda lr, a: adamw_8bit(
        lr,
        b1=a.get("betas", (0.9, 0.999))[0],
        b2=a.get("betas", (0.9, 0.999))[1],
        eps=a.get("eps", 1e-8),
        weight_decay=0.0,
    ),
}


def is_schedule_free(name: str) -> bool:
    return "schedulefree" in name.lower().replace("_", "")


def get_optimizer(
    name: str,
    lr: ScheduleOrFloat,
    args: Optional[dict] = None,
    max_grad_norm: Optional[float] = None,
    max_grad_value: Optional[float] = None,
) -> optax.GradientTransformation:
    """Resolve a reference optimizer string to an optax transformation,
    with the reference's clipping hooks (for_training.py:98-109) folded in
    as leading chain links."""
    args = dict(args or {})
    if isinstance(args.get("betas"), list):
        args["betas"] = tuple(args["betas"])

    key = name.lower()
    if key in _REGISTRY:
        tx = _REGISTRY[key](lr, args)
    elif key.startswith("optax."):
        tx = getattr(optax, key.split(".", 1)[1])(lr, **args)
    else:
        raise ValueError(f"Unknown optimizer: {name!r}")

    chain = []
    if max_grad_value is not None:
        chain.append(optax.clip(max_grad_value))
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(tx)
    return optax.chain(*chain) if len(chain) > 1 else tx


def eval_params(name: str, opt_state, params):
    """Schedule-free evaluation params (reference optimizer.eval())."""
    if not is_schedule_free(name):
        return params
    return optax.contrib.schedule_free_eval_params(_find_sf_state(opt_state), params)


def _find_sf_state(opt_state):
    from optax.contrib import ScheduleFreeState

    found = []

    def visit(node):
        if isinstance(node, ScheduleFreeState):
            found.append(node)
            return
        if isinstance(node, (tuple, list)):
            for item in node:
                visit(item)

    visit(opt_state)
    if not found:
        raise ValueError("no ScheduleFreeState in optimizer state")
    return found[0]
