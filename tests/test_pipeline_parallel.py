"""GPipe pipeline parallelism (parallel/pipeline.py): numerics vs a
single-device layer stack, gradients through the schedule, and a
Lumina2-block pipeline on the virtual device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vision_ft_tpu.parallel.pipeline import (
    pipeline_apply,
    shard_pipeline_params,
    stack_pipeline_stages,
)


def _mesh(n, axis="pipe"):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), (axis,))


def _mlp_layer_params(key, dim, depth):
    keys = jax.random.split(key, depth)
    return [
        {
            "w": jax.random.normal(k, (dim, dim), jnp.float32) * (dim**-0.5),
            "b": jnp.zeros((dim,), jnp.float32),
        }
        for k in keys
    ]


def _apply_layers(layers, x):
    """Reference: sequentially apply a list of residual-MLP layers."""
    for lp in layers:
        x = x + jnp.tanh(x @ lp["w"] + lp["b"])
    return x


def _stage_fn(stage_params, x):
    """One pipeline stage: scan over this stage's stacked layers."""

    def body(h, lp):
        return h + jnp.tanh(h @ lp["w"] + lp["b"]), None

    out, _ = jax.lax.scan(body, x, stage_params)
    return out


def test_pipeline_matches_sequential():
    mesh = _mesh(4)
    dim, depth, num_mb, mb = 16, 8, 6, 2
    layers = _mlp_layer_params(jax.random.PRNGKey(0), dim, depth)
    xs = jax.random.normal(jax.random.PRNGKey(1), (num_mb, mb, dim))

    stages = stack_pipeline_stages(layers, 4)
    stages = shard_pipeline_params(mesh, stages)
    got = pipeline_apply(_stage_fn, stages, xs, mesh)

    want = jnp.stack([_apply_layers(layers, xs[m]) for m in range(num_mb)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_pipeline_under_jit_and_grad():
    """jax.grad through the scan+ppermute schedule equals the sequential
    gradient — the backward pass IS the reverse pipeline schedule."""
    mesh = _mesh(2)
    dim, depth, num_mb, mb = 8, 4, 3, 2
    layers = _mlp_layer_params(jax.random.PRNGKey(2), dim, depth)
    xs = jax.random.normal(jax.random.PRNGKey(3), (num_mb, mb, dim))
    stages = stack_pipeline_stages(layers, 2)

    def loss_pp(stages, xs):
        return jnp.mean(jnp.square(pipeline_apply(_stage_fn, stages, xs, mesh)))

    def loss_seq(stages, xs):
        flat = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), stages)
        layer_list = [jax.tree.map(lambda a: a[i], flat) for i in range(depth)]
        out = jnp.stack([_apply_layers(layer_list, xs[m]) for m in range(num_mb)])
        return jnp.mean(jnp.square(out))

    g_pp = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(stages, xs)
    g_seq = jax.jit(jax.grad(loss_seq, argnums=(0, 1)))(stages, xs)
    for got, want in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )


def test_pipeline_passes_aux_through():
    """Per-microbatch aux (rope tables, adaLN embeddings) rides the x
    pytree unchanged through every stage."""
    mesh = _mesh(2)
    dim, depth, num_mb, mb = 8, 2, 4, 2
    layers = _mlp_layer_params(jax.random.PRNGKey(4), dim, depth)
    xs = {
        "h": jax.random.normal(jax.random.PRNGKey(5), (num_mb, mb, dim)),
        "scale": jnp.arange(1.0, num_mb + 1)[:, None, None]
        * jnp.ones((num_mb, 1, 1)),
    }
    stages = stack_pipeline_stages(layers, 2)

    def stage_fn(stage_params, x):
        def body(h, lp):
            return h + x["scale"] * jnp.tanh(h @ lp["w"] + lp["b"]), None

        h, _ = jax.lax.scan(body, x["h"], stage_params)
        return {"h": h, "scale": x["scale"]}

    got = pipeline_apply(stage_fn, stages, xs, mesh)
    np.testing.assert_allclose(np.asarray(got["scale"]), np.asarray(xs["scale"]))

    # reference
    want = []
    layer_list = layers
    for m in range(num_mb):
        h = xs["h"][m]
        for lp in layer_list:
            h = h + xs["scale"][m] * jnp.tanh(h @ lp["w"] + lp["b"])
        want.append(h)
    np.testing.assert_allclose(
        np.asarray(got["h"]), np.asarray(jnp.stack(want)), atol=1e-5, rtol=1e-5
    )


def test_lumina2_denoiser_set_pipeline_matches_sequential():
    """NextDiT.set_pipeline: the full denoiser forward with the main
    stack pipelined over 2 stages x 2 microbatches equals the plain
    sequential forward, and grads stay finite under remat."""
    from vision_ft_tpu.models.lumina2.config import DenoiserConfig
    from vision_ft_tpu.models.lumina2.denoiser import Denoiser

    mesh = _mesh(2)
    cfg = DenoiserConfig(
        hidden_dim=48, num_heads=6, num_kv_heads=2, depth=4, refiner_depth=1,
        axes_dims=[4, 2, 2], timestep_embed_dim=16, multiple_of=16,
    )
    dn = Denoiser(cfg)
    params = dn.init(jax.random.PRNGKey(0))
    lat = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, cfg.in_channels))
    cap = jax.random.normal(jax.random.PRNGKey(2), (4, 6, cfg.caption_dim))
    mask = jnp.ones((4, 6), bool)
    t = jnp.array([0.1, 0.4, 0.6, 0.9])

    want = dn(params, lat, cap, t, mask)[0]
    try:
        dn.set_pipeline(mesh, num_microbatches=2)
        got = jax.jit(lambda p: dn(p, lat, cap, t, mask)[0])(params)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
        )

        dn.set_gradient_checkpointing(True)

        def loss(p):
            return jnp.mean(jnp.square(dn(p, lat, cap, t, mask)[0]))

        g = jax.jit(jax.grad(loss))(params)
        dn.set_pipeline(None, 1)
        g_seq = jax.jit(jax.grad(loss))(params)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_seq)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5, rtol=3e-5
            )
    finally:
        dn.set_pipeline(None, 1)
        dn.set_gradient_checkpointing(False)


@pytest.mark.parametrize("use_rope", [False, True])
def test_auraflow_denoiser_set_pipeline_matches_sequential(use_rope):
    """AuraFlow MMDiT set_pipeline: double + single stacks pipelined over
    2 stages x 2 microbatches equal the sequential forward (learned-PE
    and RoPE position encodings — the static-aux path)."""
    from vision_ft_tpu.models.auraflow.config import DenoiserConfig
    from vision_ft_tpu.models.auraflow.denoiser import Denoiser

    mesh = _mesh(2)
    kwargs = dict(
        in_channels=4, out_channels=4, patch_size=2,
        caption_projection_dim=64, num_double_layers=2, num_single_layers=2,
        num_attention_heads=2, attention_head_dim=32, joint_attention_dim=48,
        pos_embed_max_size=16 * 16, num_register_tokens=2,
        use_flash_attn=False,
    )
    if use_rope:
        kwargs.update(use_rope=True, rope_dim_sizes=[8, 12, 12])
    dn = Denoiser(DenoiserConfig(**kwargs))
    params = dn.init(jax.random.PRNGKey(0))
    lat = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 4))
    txt = jax.random.normal(jax.random.PRNGKey(2), (4, 6, 48))
    t = jnp.array([0.1, 0.4, 0.6, 0.9])

    want = dn(params, lat, txt, t)
    try:
        dn.set_pipeline(mesh, num_microbatches=2)
        got = jax.jit(lambda p: dn(p, lat, txt, t))(params)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
        )
        dn.set_gradient_checkpointing(True)

        def loss(p):
            return jnp.mean(jnp.square(dn(p, lat, txt, t)))

        g_pp = jax.jit(jax.grad(loss))(params)
        dn.set_pipeline(None, 1)
        g_seq = jax.jit(jax.grad(loss))(params)
        for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5, rtol=3e-5
            )
    finally:
        dn.set_pipeline(None, 1)
        dn.set_gradient_checkpointing(False)


def test_cogview4_denoiser_set_pipeline_matches_sequential():
    from vision_ft_tpu.models.cogview4.config import DenoiserConfig
    from vision_ft_tpu.models.cogview4.denoiser import Denoiser

    mesh = _mesh(2)
    dn = Denoiser(DenoiserConfig(
        patch_size=2, in_channels=4, out_channels=4, num_layers=2,
        attention_head_dim=16, num_attention_heads=4, text_embed_dim=40,
        time_embed_dim=32, condition_dim=8, rope_axes_dim=[16, 16],
        attention_backend="eager",
    ))
    params = dn.init(jax.random.PRNGKey(0))
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    txt = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 40))
    t = jnp.array([100.0, 700.0])
    size = jnp.full((2, 2), 64.0)
    crop = jnp.zeros((2, 2))

    want = dn(params, lat, txt, t, size, size, crop)
    try:
        dn.set_pipeline(mesh, num_microbatches=2)
        got = jax.jit(lambda p: dn(p, lat, txt, t, size, size, crop))(params)
    finally:
        dn.set_pipeline(None, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_wan_denoiser_set_pipeline_matches_sequential():
    from vision_ft_tpu.models.wan.config import DenoiserConfig
    from vision_ft_tpu.models.wan.denoiser import Denoiser

    mesh = _mesh(2)
    dn = Denoiser(DenoiserConfig(
        type="ti2v", in_channels=8, out_channels=8, hidden_dim=64,
        ffn_dim=128, freq_dim=32, text_dim=24, num_heads=4, num_layers=2,
        text_length=16, patch_size=(1, 2, 2),
    ))
    params = dn.init(jax.random.PRNGKey(0))
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 4, 4, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 10, 24))
    t = jnp.array([500.0, 100.0])

    want = dn(params, lat, t, ctx)
    try:
        dn.set_pipeline(mesh, num_microbatches=2)
        got = jax.jit(lambda p: dn(p, lat, t, ctx))(params)
    finally:
        dn.set_pipeline(None, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_wan_cogview4_pipelined_grads_match_sequential():
    """Grad equality for the two families whose pipeline tests were
    forward-only (Wan video DiT, CogView4)."""
    from vision_ft_tpu.models.cogview4.config import DenoiserConfig as CogCfg
    from vision_ft_tpu.models.cogview4.denoiser import Denoiser as CogDen
    from vision_ft_tpu.models.wan.config import DenoiserConfig as WanCfg
    from vision_ft_tpu.models.wan.denoiser import Denoiser as WanDen

    mesh = _mesh(2)

    wan = WanDen(WanCfg(
        type="ti2v", in_channels=8, out_channels=8, hidden_dim=64,
        ffn_dim=128, freq_dim=32, text_dim=24, num_heads=4, num_layers=2,
        text_length=16, patch_size=(1, 2, 2),
    ))
    wp = wan.init(jax.random.PRNGKey(0))
    wan_args = (
        jax.random.normal(jax.random.PRNGKey(1), (2, 2, 4, 4, 8)),
        jnp.array([500.0, 100.0]),
        jax.random.normal(jax.random.PRNGKey(2), (2, 10, 24)),
    )

    cog = CogDen(CogCfg(
        patch_size=2, in_channels=4, out_channels=4, num_layers=2,
        attention_head_dim=16, num_attention_heads=4, text_embed_dim=40,
        time_embed_dim=32, condition_dim=8, rope_axes_dim=[16, 16],
        attention_backend="eager",
    ))
    cp = cog.init(jax.random.PRNGKey(0))
    size = jnp.full((2, 2), 64.0)
    cog_args = (
        jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4)),
        jax.random.normal(jax.random.PRNGKey(2), (2, 5, 40)),
        jnp.array([100.0, 700.0]),
        size, size, jnp.zeros((2, 2)),
    )

    for dn, params, args in ((wan, wp, wan_args), (cog, cp, cog_args)):
        def loss(p):
            return jnp.mean(jnp.square(dn(p, *args)))

        try:
            dn.set_pipeline(mesh, num_microbatches=2)
            g_pp = jax.jit(jax.grad(loss))(params)
        finally:
            dn.set_pipeline(None, 1)
        g_seq = jax.jit(jax.grad(loss))(params)
        for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5, rtol=3e-5
            )


def test_flux_denoiser_set_pipeline_partial_stacks():
    """Flux: 1 double block (indivisible by pipe 2 — runs sequentially)
    + 2 single blocks (pipelined). The mixed mode must match the fully
    sequential forward."""
    from vision_ft_tpu.models.flux.config import DenoiserConfig
    from vision_ft_tpu.models.flux.denoiser import Denoiser

    mesh = _mesh(2)
    dn = Denoiser(DenoiserConfig(
        type="flux1-dev", in_channels=16, out_channels=16, vec_in_dim=24,
        context_in_dim=32, hidden_size=48, mlp_ratio=2.0, num_heads=2,
        depth=1, depth_single_blocks=2, axes_dim=[8, 8, 8], patch_size=2,
        vae_channels=4, guidance_embed=True, use_flash_attention=False,
    ))
    params = dn.init(jax.random.PRNGKey(0))
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t5 = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 32))
    clip = jax.random.normal(jax.random.PRNGKey(3), (2, 24))
    t = jnp.array([0.5, 0.9])
    g = jnp.full((2,), 3.5)

    want = dn(params, lat, t5, t, clip, guidance=g)
    try:
        dn.set_pipeline(mesh, num_microbatches=2)
        got = jax.jit(lambda p: dn(p, lat, t5, t, clip, guidance=g))(params)
    finally:
        dn.set_pipeline(None, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)

    # neither stack divisible by a pipe of 7 -> rejected up front
    mesh7 = _mesh(7)
    with pytest.raises(AssertionError):
        dn.set_pipeline(mesh7, 1)
    assert dn._pipeline is None


def test_run_pipelined_stack_shards_batch_over_data():
    """On a data x pipe mesh the per-microbatch batch dim shards over
    data (no replicated compute), static aux stays out of the ring, and
    numerics match the sequential stack."""
    from vision_ft_tpu.parallel import MeshConfig, make_mesh, run_pipelined_stack

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(MeshConfig(data=4, pipe=2), devices=jax.devices()[:8])
    dim, depth = 16, 4
    layers = _mlp_layer_params(jax.random.PRNGKey(0), dim, depth)
    x = jax.random.normal(jax.random.PRNGKey(9), (8, 6, dim))
    pe = jnp.linspace(0.0, 1.0, 6 * dim).reshape(6, dim)

    def layer_fn(lp, c, static):
        return {"h": c["h"] + jnp.tanh(c["h"] @ lp["w"] + lp["b"] + static)}

    got = jax.jit(
        lambda ls: run_pipelined_stack(
            layer_fn, ls, {"h": x}, pe, mesh, num_microbatches=2
        )["h"]
    )(layers)
    h = x
    for lp in layers:
        h = h + jnp.tanh(h @ lp["w"] + lp["b"] + pe)
    np.testing.assert_allclose(np.asarray(got), np.asarray(h), atol=1e-5, rtol=1e-5)

    # microbatch size (8/4=2) not divisible by data axis (4) -> named error
    with pytest.raises(AssertionError, match="data"):
        run_pipelined_stack(layer_fn, layers, {"h": x}, pe, mesh,
                            num_microbatches=4)


def test_train_step_on_data_x_pipe_mesh():
    """Full jitted train step (value_and_grad + AdamW) over a
    data2 x pipe2 mesh with the Lumina2 denoiser pipelined: loss matches
    the single-device sequential step."""
    import optax

    from vision_ft_tpu.models.lumina2.config import DenoiserConfig
    from vision_ft_tpu.models.lumina2.denoiser import Denoiser
    from vision_ft_tpu.parallel import MeshConfig, make_mesh, shard_batch, shard_params
    from vision_ft_tpu.training import make_train_step
    from vision_ft_tpu.training.train_step import init_train_state

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = make_mesh(MeshConfig(data=2, fsdp=1, tensor=1, pipe=2),
                     devices=jax.devices()[:4])
    assert mesh.axis_names == ("data", "pipe", "fsdp", "tensor")

    dn = Denoiser(DenoiserConfig(
        hidden_dim=48, num_heads=6, num_kv_heads=2, depth=4, refiner_depth=1,
        axes_dims=[4, 2, 2], timestep_embed_dim=16, multiple_of=16,
    ))
    params = dn.init(jax.random.PRNGKey(0))
    lat = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, dn.config.in_channels))
    cap = jax.random.normal(jax.random.PRNGKey(2), (4, 6, dn.config.caption_dim))
    mask = jnp.ones((4, 6), bool)
    t = jnp.linspace(0.1, 0.9, 4)

    def loss_fn(trainable, frozen, batch, key):
        vel, _, _ = dn(trainable, batch["lat"], batch["cap"], batch["t"], batch["mask"])
        return jnp.mean(jnp.square(vel)), {}

    tx = optax.adamw(1e-3)
    batch = {"lat": lat, "cap": cap, "t": t, "mask": mask}

    losses = {}
    try:
        for mode in ("pipelined", "sequential"):
            if mode == "pipelined":
                dn.set_pipeline(mesh, num_microbatches=2)
                with mesh:
                    p = shard_params(mesh, params)
                    state = init_train_state(tx, p)
                    step = make_train_step(loss_fn, tx, mesh=mesh, donate=False)
                    _, metrics = step(state, {}, shard_batch(mesh, batch),
                                      jax.random.PRNGKey(3))
            else:
                dn.set_pipeline(None, 1)
                state = init_train_state(tx, params)
                step = make_train_step(loss_fn, tx, donate=False)
                _, metrics = step(state, {}, batch, jax.random.PRNGKey(3))
            losses[mode] = float(metrics["train/loss"])
    finally:
        dn.set_pipeline(None, 1)
    assert abs(losses["pipelined"] - losses["sequential"]) < 1e-5, losses


def test_trainer_rejects_pipe_for_non_pp_family():
    """trainer.mesh.pipe > 1 on a model without set_pipeline fails fast
    with a clear error instead of silently replicating."""
    from vision_ft_tpu.config import TrainConfig
    from vision_ft_tpu.trainer import Trainer

    cfg = TrainConfig.model_validate({
        "model": {"checkpoint_path": ""},
        "dataset": {},
        "optimizer": {"name": "torch.optim.AdamW", "args": {"lr": 1e-4}},
        "seed": 0,
        "num_train_epochs": 1,
        "trainer": {"mesh": {"pipe": 2, "pipeline_microbatches": 2}},
    })
    assert cfg.trainer.mesh.pipe == 2

    class StubModel:
        def __init__(self, trainer, config):
            self.model = object()  # no .denoiser / set_pipeline

        def before_setup_model(self):
            pass

        def setup_model(self):
            pass

        def after_setup_model(self):
            pass

        def _set_is_peft(self, value):
            pass

    trainer = Trainer(cfg)
    trainer.register_model_class(StubModel)
    with pytest.raises(ValueError, match="set_pipeline"):
        trainer.prepare_model()


def test_pipeline_lumina2_blocks():
    """Pipeline the real Lumina2 transformer block across 4 stages and
    match the sequential forward."""
    from vision_ft_tpu.models.lumina2.denoiser import TransformerBlock

    mesh = _mesh(4)
    h_heads, kv, d = 4, 2, 8
    dim = h_heads * d
    depth, num_mb, mb, s = 4, 2, 1, 16
    block = TransformerBlock(dim, h_heads, kv, multiple_of=16)
    layer_params = [
        block.init(jax.random.PRNGKey(10 + i)) for i in range(depth)
    ]
    x = jax.random.normal(jax.random.PRNGKey(6), (num_mb, mb, s, dim))
    ang = jnp.linspace(0.0, 2.0, mb * s * (d // 2)).reshape(mb, s, d // 2)
    freqs = jnp.broadcast_to(
        jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1), (mb, s, d // 2, 2)
    )
    freqs_mb = jnp.broadcast_to(freqs[None], (num_mb,) + freqs.shape)
    adaln = jax.random.normal(jax.random.PRNGKey(7), (num_mb, mb, 1024))

    def stage_fn(stage_params, xt):
        def body(h, lp):
            return block(lp, h, xt["freqs"], adaln_input=xt["adaln"]), None

        h, _ = jax.lax.scan(body, xt["h"], stage_params)
        return {"h": h, "freqs": xt["freqs"], "adaln": xt["adaln"]}

    stages = stack_pipeline_stages(layer_params, 4)
    got = pipeline_apply(
        stage_fn, stages, {"h": x, "freqs": freqs_mb, "adaln": adaln}, mesh
    )["h"]

    want = []
    for m in range(num_mb):
        h = x[m]
        for lp in layer_params:
            h = block(lp, h, freqs, adaln_input=adaln[m])
        want.append(h)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(jnp.stack(want)), atol=2e-5, rtol=2e-5
    )
