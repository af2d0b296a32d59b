"""Optimizer factory, LR schedules, SPMD train step (8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vision_ft_tpu.parallel import (
    MeshConfig,
    batch_sharding,
    make_mesh,
    shard_batch,
    shard_params,
)
from vision_ft_tpu.training import TrainState, get_optimizer, get_schedule, make_train_step
from vision_ft_tpu.training.optimizer import adamw_8bit, eval_params, is_schedule_free
from vision_ft_tpu.training.train_step import init_train_state


def _quadratic_loss(trainable, frozen, batch, key):
    pred = batch["x"] @ trainable["w"] + frozen["b"]
    loss = jnp.mean(jnp.square(pred - batch["y"]))
    return loss, {"train/mse": loss}


def test_optimizer_registry_resolves_reference_names():
    for name in [
        "torch.optim.AdamW",
        "torch.optim.SGD",
        "schedulefree.RAdamScheduleFree",
        "bitsandbytes.optim.AdamW8bit",
        "optax.lion",
    ]:
        tx = get_optimizer(name, 1e-3)
        state = tx.init({"w": jnp.ones((4, 4))})
        assert state is not None
    assert is_schedule_free("schedulefree.RAdamScheduleFree")
    assert not is_schedule_free("torch.optim.AdamW")


def test_grad_clipping_chained():
    tx = get_optimizer("torch.optim.SGD", 1.0, max_grad_norm=1e-6)
    params = {"w": jnp.ones((2,))}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.full((2,), 100.0)}, state, params)
    assert float(jnp.abs(updates["w"]).max()) < 1e-5


def test_schedules():
    lin = get_schedule("linear", 1.0, num_training_steps=100, num_warmup_steps=10)
    assert float(lin(0)) < 0.2
    assert float(lin(10)) == pytest.approx(1.0, abs=1e-6)
    assert float(lin(100)) == pytest.approx(0.0, abs=1e-2)
    cos = get_schedule("cosine", 2.0, num_training_steps=100, num_warmup_steps=0)
    assert float(cos(1)) <= 2.0 and float(cos(99)) < 0.1
    const = get_schedule(None, 0.5)
    assert float(const(12345)) == 0.5


def test_adamw8bit_roughly_matches_adamw():
    key = jax.random.PRNGKey(0)
    w0 = jax.random.normal(key, (64, 8))
    grads = jax.random.normal(jax.random.PRNGKey(1), (64, 8))
    ref_tx = optax.adamw(1e-2, weight_decay=0.0)
    q_tx = adamw_8bit(1e-2, weight_decay=0.0, block_size=64)
    p_ref, p_q = {"w": w0}, {"w": w0}
    s_ref, s_q = ref_tx.init(p_ref), q_tx.init(p_q)
    for _ in range(5):
        u_ref, s_ref = ref_tx.update({"w": grads}, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u_ref)
        u_q, s_q = q_tx.update({"w": grads}, s_q, p_q)
        p_q = optax.apply_updates(p_q, u_q)
    np.testing.assert_allclose(np.asarray(p_q["w"]), np.asarray(p_ref["w"]), atol=5e-3)
    # int8 moments actually stored as int8
    leaf = jax.tree.leaves(s_q["mu"], is_leaf=lambda x: isinstance(x, dict) and "q" in x)[0]
    assert leaf["q"].dtype == jnp.int8


def test_schedule_free_eval_params():
    tx = get_optimizer("schedulefree.RAdamScheduleFree", 1e-2)
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    updates, state = tx.update({"w": jnp.ones((4,))}, state, params)
    params = optax.apply_updates(params, updates)
    evaluated = eval_params("schedulefree.RAdamScheduleFree", state, params)
    assert evaluated["w"].shape == (4,)


def test_train_step_converges_on_mesh():
    mesh = make_mesh(MeshConfig(data=8))
    key = jax.random.PRNGKey(0)
    true_w = jax.random.normal(key, (4, 2))
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 4))
    batch = {"x": x, "y": x @ true_w + 0.5}

    tx = get_optimizer("torch.optim.AdamW", 5e-2)
    trainable = shard_params(mesh, {"w": jnp.zeros((4, 2))})
    frozen = shard_params(mesh, {"b": jnp.asarray(0.5)})
    state = init_train_state(tx, trainable)
    step = make_train_step(_quadratic_loss, tx, mesh=mesh)

    batch = shard_batch(mesh, batch)
    for i in range(200):
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(i))
    assert float(metrics["train/loss"]) < 1e-3
    np.testing.assert_allclose(np.asarray(state.trainable["w"]), np.asarray(true_w), atol=0.05)
    assert int(state.step) == 200


def test_train_step_grad_accum_equivalence():
    mesh = make_mesh(MeshConfig(data=8))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (32, 4))
    y = jax.random.normal(jax.random.PRNGKey(1), (32, 2))
    trainable = {"w": jnp.zeros((4, 2))}
    frozen = {"b": jnp.asarray(0.0)}
    tx = optax.sgd(0.1)

    # one big batch
    step1 = make_train_step(_quadratic_loss, tx, mesh=mesh, donate=False)
    s1 = init_train_state(tx, trainable)
    s1, m1 = step1(s1, frozen, {"x": x, "y": y}, jax.random.PRNGKey(2))

    # 4 microbatches of 8
    step4 = make_train_step(_quadratic_loss, tx, mesh=mesh, grad_accum=4, donate=False)
    s4 = init_train_state(tx, trainable)
    mb = {"x": x.reshape(4, 8, 4), "y": y.reshape(4, 8, 2)}
    s4, m4 = step4(s4, frozen, mb, jax.random.PRNGKey(2))

    np.testing.assert_allclose(
        np.asarray(s4.trainable["w"]), np.asarray(s1.trainable["w"]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(float(m4["train/loss"]), float(m1["train/loss"]), rtol=1e-5)


def test_fsdp_param_sharding():
    mesh = make_mesh(MeshConfig(data=2, fsdp=4))
    params = {"w": jnp.zeros((128, 16)), "tiny": jnp.zeros((3,))}
    sharded = shard_params(mesh, params)
    # 128 divisible by 4 -> sharded on fsdp; tiny replicated
    w_shard = sharded["w"].sharding.spec
    assert "fsdp" in str(w_shard)
    assert sharded["tiny"].sharding.spec == jax.sharding.PartitionSpec()
    assert batch_sharding(mesh).spec == jax.sharding.PartitionSpec("data")


def test_tensor_parallel_sharding_equivalence():
    """TP+FSDP+DP sharded forward/grads == replicated (8-dev CPU mesh)."""
    import numpy as np

    from vision_ft_tpu.models.sdxl.config import DenoiserConfig
    from vision_ft_tpu.models.sdxl.denoiser import Denoiser
    from vision_ft_tpu.nn import flatten_params
    from vision_ft_tpu.parallel import MeshConfig, make_mesh, shard_batch, shard_params
    from vision_ft_tpu.parallel.mesh import param_shardings

    cfg = DenoiserConfig(
        hidden_dim=32, num_head_channels=8, context_dim=64,
        global_cond_dim=64 + 6 * 256, block_out_channels=[32, 64, 64],
        num_transformers_per_block=[1, 1, 1], attention_backend="xla",
    )
    dn = Denoiser(cfg)
    params = dn.init(jax.random.PRNGKey(0))
    args = (
        jnp.ones((4, 16, 16, 4)), jnp.full((4,), 500.0),
        jnp.ones((4, 77, 64)), jnp.ones((4, 64)),
        jnp.full((4, 2), 128.0), jnp.full((4, 2), 128.0), jnp.zeros((4, 2)),
    )
    ref = jax.jit(dn)(params, *args)

    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    # the Megatron split actually hits attention projections
    specs = flatten_params(param_shardings(mesh, params))
    assert any("tensor" in str(s.spec) for s in specs.values())
    with mesh:
        sharded = shard_params(mesh, params)
        sharded_args = shard_batch(mesh, args)
        out = jax.jit(dn)(sharded, *sharded_args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

        def loss(p, *a):
            return jnp.mean(jnp.square(dn(p, *a)))

        g_ref = jax.jit(jax.grad(loss))(params, *args)
        g_tp = jax.jit(jax.grad(loss))(sharded, *sharded_args)
    fr, ft = flatten_params(g_ref), flatten_params(g_tp)
    worst = max(float(jnp.abs(fr[k] - ft[k]).max()) for k in fr)
    assert worst < 5e-5, worst


def test_remat_saves_modes_grad_equivalence():
    """TrainerConfig.remat_saves modes change only memory/recompute, never
    values: grads through a remat'd flash block are identical across
    "none" / "kernel" / "activations"."""
    from vision_ft_tpu.nn.core import remat_layer, save_name, set_remat_saves
    from vision_ft_tpu.ops.pallas.flash_attention import flash_attention_bshd

    def block(w, x):
        q, k, v = x @ w["q"], x @ w["k"], x @ w["v"]
        o = flash_attention_bshd(q, k, v, num_heads=2, interpret=True)
        h = save_name(jax.nn.gelu(o @ w["f"]), "ff_inner")
        return (save_name(x + h, "res_stream") ** 2).mean()

    w = {
        n: jax.random.normal(jax.random.PRNGKey(i), (128, 128), jnp.float32) * 0.1
        for i, n in enumerate("qkvf")
    }
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 128, 128), jnp.float32)

    grads = {}
    try:
        for mode in ("none", "kernel", "activations"):
            set_remat_saves(mode)
            grads[mode] = jax.grad(remat_layer(lambda w, x: block(w, x)))(w, x)
    finally:
        set_remat_saves("activations")

    for mode in ("kernel", "none"):
        for k in grads["activations"]:
            np.testing.assert_allclose(
                np.asarray(grads[mode][k]),
                np.asarray(grads["activations"][k]),
                rtol=1e-6, atol=1e-6,
            )


def test_lumina2_gqa_pre_repeat_qkv_saves():
    """Lumina2's GQA attention tags its PRE-repeat q/k/v for the remat
    policy (the flash kernel's own post-repeat tags are suppressed via
    tag_qkv=False): under remat_saves="activations" the saved k/v carry
    num_kv_heads (not num_heads) and grads match plain full remat."""
    from jax._src.ad_checkpoint import saved_residuals

    from vision_ft_tpu.models.lumina2.denoiser import SelfAttention
    from vision_ft_tpu.nn import flatten_params
    from vision_ft_tpu.nn.core import remat_layer, set_remat_saves

    h, kv, d, b, s = 6, 2, 16, 2, 64
    attn = SelfAttention(hidden_dim=h * d, num_heads=h, num_kv_heads=kv)
    params = attn.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, h * d), jnp.float32)
    ang = jnp.linspace(0.0, 3.0, b * s * (d // 2)).reshape(b, s, d // 2)
    freqs = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)

    def loss(p, x):
        return jnp.mean(jnp.square(attn(p, x, freqs)))

    try:
        set_remat_saves("activations")
        saved = saved_residuals(remat_layer(loss), params, x)
        shapes = [tuple(a.shape) for a, _ in saved if getattr(a, "ndim", 0) == 4]
        assert shapes.count((b, kv, s, d)) == 2, shapes  # pre-repeat k, v
        # only q carries num_heads; repeated k/v (two more) are NOT saved
        assert shapes.count((b, h, s, d)) == 1, shapes

        g_remat = jax.grad(remat_layer(loss))(params, x)
        set_remat_saves("none")
        g_full = jax.grad(remat_layer(loss))(params, x)
    finally:
        set_remat_saves("activations")
    fr, ff = flatten_params(g_remat), flatten_params(g_full)
    for key in fr:
        np.testing.assert_allclose(
            np.asarray(fr[key]), np.asarray(ff[key]), rtol=1e-6, atol=1e-6
        )


def test_trainer_config_remat_saves_field():
    from vision_ft_tpu.config import TrainerConfig

    assert TrainerConfig().remat_saves == "activations"
    assert TrainerConfig(remat_saves="none").remat_saves == "none"
    with pytest.raises(Exception):
        TrainerConfig(remat_saves="everything")
