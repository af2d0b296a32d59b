"""Trainer: the full training run orchestrator.

Behavioral spec: /root/reference/src/trainer/common.py (469 LoC) — config
-> dataloaders, saving/preview strategies, PEFT swap, optimizer/scheduler,
epoch/step loop with gradient accumulation, debug modes, main-process-only
side effects.

TPU-native architecture (SURVEY.md §2.11, §7):
- Accelerate/DDP is replaced by a ``jax.sharding.Mesh``: batches shard
  over the ``data`` axis, params replicate (or fsdp-shard), and XLA
  inserts the gradient all-reduce — there is no wrapping of the model.
- The loop body is two jitted functions: ``grad_fn`` (value_and_grad of
  the workload's pure loss_fn) and ``apply_fn`` (optax update). They are
  split — not fused like training/train_step.make_train_step — because
  aspect-ratio buckets give batches different (H, W) shapes: grad_fn
  retraces per bucket shape while the grads pytree (fixed shape) flows
  into one compiled apply_fn; accumulation across loader microbatches is
  a device-side tree add, the jax analogue of DDP no_sync accumulation.
- PEFT is a param-tree transformation: trainable/frozen split feeds the
  grad step directly; the base model is frozen by construction.
"""

from __future__ import annotations

import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import DEBUG_MODE_TYPE, TrainConfig
from ..dataloader import DataLoader, get_dataloader_for_bucketing, get_dataloader_for_preview
from ..dataset.util import DatasetConfig
from ..models.for_training import ModelForTraining
from ..modules.peft import split_peft_params, merge_params
from ..nn.core import Params, flatten_params, unflatten_params
from ..parallel import (
    MeshConfig,
    barrier,
    is_main_process,
    make_mesh,
    shard_batch,
    shard_params,
)
from ..preview import PreviewStrategy, get_preview_callback
from ..saving import ModelSavingStrategy, get_saving_callback
from ..training.optimizer import eval_params, get_optimizer, is_schedule_free
from ..training.scheduler import get_schedule
from ..utils.logging import Trackers, get_trackers

_DONATION_WARNING_SILENCED = [False]


def _silence_donation_warning_once() -> None:
    """Sub-tile LoRA leaves routinely defeat buffer donation; jax then
    prints one UserWarning per leaf per compile (hundreds of lines).
    The filter is process-global by nature — installed once, and only for
    this specific message."""
    if not _DONATION_WARNING_SILENCED[0]:
        import warnings

        warnings.filterwarnings(
            "ignore", message="Some donated buffers were not usable"
        )
        _DONATION_WARNING_SILENCED[0] = True



class Trainer:
    model: ModelForTraining

    def __init__(self, config: TrainConfig, seed: Optional[int] = None) -> None:
        self.config = config
        self.peft_config = config.peft
        self.seed = seed if seed is not None else config.seed
        self.debug_mode: DEBUG_MODE_TYPE = config.trainer.debug_mode
        self.gradient_accumulation_steps = config.trainer.gradient_accumulation_steps

        from ..nn.core import set_remat_group, set_remat_saves

        set_remat_saves(config.trainer.remat_saves)
        set_remat_group(config.trainer.remat_group)

        mesh_cfg = config.trainer.mesh
        self.mesh = make_mesh(
            MeshConfig(
                data=mesh_cfg.data, fsdp=mesh_cfg.fsdp,
                tensor=mesh_cfg.tensor, pipe=mesh_cfg.pipe,
            )
        )

        self.trackers: Optional[Trackers] = None
        tracker_names = get_trackers(config)
        if tracker_names and is_main_process():
            self.trackers = Trackers(
                tracker_names, config.tracker.project_name, config.model_dump()
            )

        self.preview_dataset_config = None
        self.eval_dataloader = None
        self.preview_dataloader: Optional[DataLoader] = None
        self._current_lr = 0.0
        self.ema_params = None  # set by prepare_optimizer when ema_decay is on

    # -- registration --------------------------------------------------------

    def register_model_class(self, model_cls: type[ModelForTraining], *args, **kwargs):
        self.model_cls = model_cls
        self.model = model_cls(self, self.config, *args, **kwargs)

    def register_train_dataset_class(self, dataset_config_class: type[DatasetConfig], *a, **k):
        self.dataset_config = dataset_config_class.model_validate(self.config.dataset)

    def register_preview_dataset_class(self, dataset_config_class, *a, **k):
        if self.config.preview is not None:
            self.preview_dataset_config = dataset_config_class.model_validate(
                self.config.preview.data
            )

    @property
    def raw_model(self) -> ModelForTraining:
        return self.model

    # -- preparation ---------------------------------------------------------

    def get_saving_callbacks(self):
        if (saving := self.config.saving) is not None:
            if len(saving.callbacks) == 0:
                warnings.warn("No saving callbacks found in the config")
            return [get_saving_callback(cb) for cb in saving.callbacks]
        self.print("No saving config. Model will not be saved.")
        return []

    def get_preview_callbacks(self):
        if (preview := self.config.preview) is not None:
            if len(preview.callbacks) == 0:
                warnings.warn("No preview callbacks found in the config")
            return [get_preview_callback(cb) for cb in preview.callbacks]
        self.print("No preview config. Preview will not be generated.")
        return []

    def prepare_dataloaders(self) -> None:
        train_ds = self.dataset_config.get_dataset()
        self.train_dataloader = get_dataloader_for_bucketing(
            train_ds,
            shuffle=self.dataset_config.shuffle,
            seed=self.seed,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            num_workers=getattr(self.dataset_config, "num_workers", 0),
        )
        if self.config.preview is not None and self.preview_dataset_config is not None:
            self.print("Preview config found. Preparing preview dataloader...")
            self.preview_dataloader = get_dataloader_for_preview(
                self.preview_dataset_config.get_dataset()
            )

    def prepare_saving_strategy(self) -> None:
        if (saving := self.config.saving) is not None:
            self.saving_strategy = ModelSavingStrategy.from_config(
                config=saving.strategy,
                steps_per_epoch=len(self.train_dataloader),
                total_epochs=self.config.num_train_epochs,
            )
        else:
            self.saving_strategy = ModelSavingStrategy(
                steps_per_epoch=len(self.train_dataloader),
                total_epochs=self.config.num_train_epochs,
                per_epochs=None,
                per_steps=None,
                save_last=False,
            )
        self.saving_callbacks = self.get_saving_callbacks()

    def prepare_preview_strategy(self) -> None:
        if (preview := self.config.preview) is not None:
            self.preview_strategy = PreviewStrategy.from_config(
                config=preview.strategy,
                steps_per_epoch=len(self.train_dataloader),
                total_epochs=self.config.num_train_epochs,
            )
        else:
            self.preview_strategy = PreviewStrategy(
                steps_per_epoch=len(self.train_dataloader),
                total_epochs=self.config.num_train_epochs,
                per_epochs=None,
                per_steps=None,
            )
        self.preview_callbacks = self.get_preview_callbacks()

    def setup_peft_if_needed(self) -> None:
        if self.peft_config is not None:
            self.print("Applying PEFT")
            self.model._set_is_peft(True)
            peft_configs = (
                self.peft_config
                if isinstance(self.peft_config, list)
                else [self.peft_config]
            )
            params = self.model.get_params()
            key = jax.random.PRNGKey(self.seed)
            for target_config in peft_configs:
                key, sub = jax.random.split(key)
                params = target_config.replace_to_peft_layer(params, sub)
            self.model.set_params(params)
            self.print("Loading PEFT weights")
            self.model.load_peft_weights()
        else:
            self.model._set_is_peft(False)

    def split_trainable(self) -> tuple[Params, Params]:
        """(trainable, frozen) from the model's full params."""
        params = self.model.get_params()
        if self.model._is_peft:
            trainable, frozen = split_peft_params(params)
            extra = {
                k: v
                for k, v in flatten_params(frozen).items()
                if self.model.peft_extra_trainable_filter(k)
            }
            if extra:
                frozen_flat = {
                    k: v
                    for k, v in flatten_params(frozen).items()
                    if k not in extra
                }
                trainable = unflatten_params(
                    {**flatten_params(trainable), **extra}
                )
                frozen = unflatten_params(frozen_flat)
            return trainable, frozen
        flat = flatten_params(params)
        trainable = {k: v for k, v in flat.items() if self.model.trainable_filter(k)}
        frozen = {k: v for k, v in flat.items() if not self.model.trainable_filter(k)}
        return unflatten_params(trainable), unflatten_params(frozen)

    def prepare_model(self) -> None:
        self.model.before_setup_model()
        self.model.setup_model()
        self.setup_peft_if_needed()
        self.model.after_setup_model()
        mesh_cfg = self.config.trainer.mesh
        if mesh_cfg.pipe > 1:
            dn = getattr(getattr(self.model, "model", None), "denoiser", None)
            if dn is None or not hasattr(dn, "set_pipeline"):
                raise ValueError(
                    "trainer.mesh.pipe > 1 but this model family's denoiser "
                    "has no set_pipeline (GPipe support: Lumina2 / AuraFlow "
                    "/ Flux / CogView4 / Wan)"
                )
            if mesh_cfg.pipeline_microbatches < 2:
                self.print(
                    "WARNING: trainer.mesh.pipe > 1 with "
                    "pipeline_microbatches=1 serializes the pipeline "
                    f"(bubble fraction {(mesh_cfg.pipe - 1) / mesh_cfg.pipe:.0%}"
                    " — every stage waits on the previous one); set "
                    "pipeline_microbatches >= pipe for real overlap"
                )
            dn.set_pipeline(self.mesh, mesh_cfg.pipeline_microbatches)
        trainable, frozen = self.split_trainable()
        n_train = sum(int(x.size) for x in jax.tree.leaves(trainable))
        n_all = n_train + sum(int(x.size) for x in jax.tree.leaves(frozen))
        self.print(
            f"Trainable params: {n_train:,}, All params: {n_all:,}, "
            f"Trainable%: {100.0 * n_train / max(n_all, 1):.4f}%"
        )
        # place params on the mesh (replicated / fsdp-sharded)
        self.model.set_params(shard_params(self.mesh, self.model.get_params()))

    def prepare_optimizer(self) -> None:
        args = dict(self.config.optimizer.args)
        lr = args.pop("lr", 1e-3)
        steps_per_epoch = max(len(self.train_dataloader), 1)
        total_steps = steps_per_epoch * self.config.num_train_epochs
        if (sched_cfg := self.config.scheduler) is not None:
            name = sched_cfg.name
            # accept reference torch scheduler strings as constant fallbacks
            if name.startswith("torch.optim.lr_scheduler"):
                name = None if "Constant" in name else name.rsplit(".", 1)[-1].lower()
            self.schedule = get_schedule(
                name, lr, num_training_steps=total_steps, args=sched_cfg.args
            )
        else:
            self.schedule = get_schedule(None, lr)

        self.optimizer_name = self.config.optimizer.name
        self.optimizer = get_optimizer(
            self.optimizer_name,
            self.schedule,
            args,
            max_grad_norm=self.config.trainer.clip_grad_norm,
            max_grad_value=self.config.trainer.clip_grad_value,
        )

        self.trainable, self.frozen = self.split_trainable()
        self.opt_state = self.optimizer.init(self.trainable)
        # fp32 accumulator: at decay 0.999+ the (1-d)*x increment rounds
        # to zero in bf16 and the EMA would freeze at its initial value.
        # Must COPY (asarray aliases same-dtype leaves, which the donated
        # apply step would delete from under the EMA tree).
        self.ema_params = (
            jax.tree.map(
                lambda x: jnp.array(x, jnp.float32, copy=True), self.trainable
            )
            if self.config.trainer.ema_decay is not None
            else None
        )
        self._build_steps()

    def _build_steps(self) -> None:
        loss_fn = self.model.loss_fn
        accum = self.gradient_accumulation_steps

        def grad_step(trainable, frozen, batch, key):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, frozen, batch, key
            )
            return loss, metrics, grads

        def apply_step(trainable, opt_state, grads):
            if accum > 1:
                grads = jax.tree.map(lambda g: g / accum, grads)
            updates, opt_state = self.optimizer.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state

        # grad_fn retraces per bucket shape; apply_fn compiles once
        _silence_donation_warning_once()
        self._grad_fn = jax.jit(grad_step)
        self._apply_fn = jax.jit(apply_step, donate_argnums=(0, 1, 2))
        decay = self.config.trainer.ema_decay
        if decay is not None:
            self._ema_fn = jax.jit(
                lambda ema, p: jax.tree.map(
                    lambda e, x: e * decay + x.astype(jnp.float32) * (1.0 - decay),
                    ema, p,
                ),
                donate_argnums=(0,),
            )
        self._zero_grads = lambda: jax.tree.map(
            lambda x: jnp.zeros(x.shape, jnp.float32), self.trainable
        )

    # -- lifecycle -----------------------------------------------------------

    def before_train(self) -> None:
        self.jax_configuration()
        if self.debug_mode is not False:
            self.print(f"Debug mode is enabled: {self.debug_mode}")
        self.print("before_train()")
        self.print(f"Seed: {self.seed}")

        self.print("Setting up dataloaders")
        self.prepare_dataloaders()
        self.print("Setting up saving strategy")
        self.prepare_saving_strategy()
        self.print("Setting up preview strategy")
        self.prepare_preview_strategy()

        if self.debug_mode == "dataset":
            self.debug_dataset()
            self.print("Dataset check done. Exiting...")
            return

        self.print("Setting up model")
        self.prepare_model()
        self.print("Setting up optimizer")
        self.prepare_optimizer()

    def after_train(self) -> None:
        self.print("after_train()")

    def training_loop(self) -> None:
        self.print("training_loop()")
        current_step = 0
        accum = self.gradient_accumulation_steps
        rng = jax.random.PRNGKey(self.seed)
        grads_acc = None

        tcfg = self.config.trainer
        # resume trainable params + optimizer state (SURVEY.md §5.3 extra;
        # the data stream restarts — only the state is recovered)
        if tcfg.state_checkpoint_dir and tcfg.resume_from_state_checkpoint:
            from ..training.state_checkpoint import restore_train_state

            restored = restore_train_state(
                tcfg.state_checkpoint_dir, self.trainable, self.opt_state,
                ema_like=self.ema_params,
            )
            if restored is not None:
                if self.ema_params is not None:
                    step0, self.trainable, self.opt_state, ema = restored
                    # pre-EMA checkpoints seed from the (possibly bf16)
                    # trainable; keep the accumulator fp32 either way
                    self.ema_params = jax.tree.map(
                        lambda x: jnp.array(x, jnp.float32, copy=True), ema
                    )
                else:
                    step0, self.trainable, self.opt_state = restored
                current_step = step0
                self.print(f"Resumed train state from step {step0}")

        for epoch in range(1, self.config.num_train_epochs + 1):
            self.model.before_train_epoch()
            self.train_dataloader.set_epoch(epoch - 1)

            for batch in self.train_dataloader:
                current_step += 1
                if tcfg.profile and current_step == tcfg.profile_start_step:
                    jax.profiler.start_trace(tcfg.profile_dir)
                self.model.before_train_step()

                host_batch = self.model.preprocess_batch(batch)
                device_batch = shard_batch(self.mesh, host_batch)
                rng, key = jax.random.split(rng)

                self.model.before_backward()
                loss, metrics, grads = self._grad_fn(
                    self.trainable, self.frozen, device_batch, key
                )
                self.model.after_backward()

                if accum > 1:
                    grads_acc = (
                        grads
                        if grads_acc is None
                        else jax.tree.map(jnp.add, grads_acc, grads)
                    )
                else:
                    grads_acc = grads

                if current_step % accum == 0:
                    self.trainable, self.opt_state = self._apply_fn(
                        self.trainable, self.opt_state, grads_acc
                    )
                    grads_acc = None
                    if self.ema_params is not None:
                        # schedule-free optimizers evaluate at the x/y
                        # interpolation, not the raw z iterate — average
                        # the eval point
                        target = self.trainable
                        if is_schedule_free(self.optimizer_name):
                            target = eval_params(
                                self.optimizer_name, self.opt_state, target
                            )
                        self.ema_params = self._ema_fn(self.ema_params, target)

                loss_value = float(loss)
                self.model.log("train/loss", loss_value, on_step=True, on_epoch=True)
                for name, value in metrics.items():
                    self.model.log(name, value, on_step=True)
                self._log_metadata(current_step)

                self.call_saving_callbacks(epoch, current_step)
                self.call_preview_callbacks(epoch, current_step)
                self.model.after_train_step()

                if tcfg.profile and current_step == tcfg.profile_stop_step:
                    jax.block_until_ready(loss)
                    jax.profiler.stop_trace()
                    self.print(f"Profiler trace written to {tcfg.profile_dir}")
                if (
                    tcfg.state_checkpoint_dir
                    and current_step % tcfg.state_checkpoint_every_steps == 0
                    and is_main_process()
                ):
                    from ..training.state_checkpoint import save_train_state

                    save_train_state(
                        tcfg.state_checkpoint_dir, current_step,
                        self.trainable, self.opt_state, ema=self.ema_params,
                    )

                if self.debug_mode == "1step":
                    break

            self.model.after_train_epoch()
            self.model.log("epoch", epoch)
            if self.debug_mode == "1step":
                break

    # -- callbacks ----------------------------------------------------------

    def _sync_model_params(self) -> None:
        """Fold the live trainable tree back into the model params (for
        saving and preview). Schedule-free optimizers evaluate at the
        averaged iterate (reference optimizer.eval()); with ema_decay set
        the EMA weights are what gets saved/previewed."""
        trainable = self.trainable
        if self.ema_params is not None:
            # fp32 accumulator -> the model's param dtypes
            trainable = jax.tree.map(
                lambda e, x: e.astype(x.dtype), self.ema_params, self.trainable
            )
        elif is_schedule_free(self.optimizer_name):
            trainable = eval_params(self.optimizer_name, self.opt_state, trainable)
        self.model.set_params(merge_params(self.frozen, trainable))

    def call_saving_callbacks(self, epoch: int, steps: int) -> None:
        if self.saving_strategy.should_save(epoch, steps):
            barrier("before_save")
            self.model.before_save_model()
            if len(self.saving_callbacks) > 0 and is_main_process():
                self._sync_model_params()
                state_dict = self.model.get_state_dict_to_save()
                metadata = self.model.get_metadata_to_save()
                self.print("Saving model...")
                state_dict = {k: np.asarray(v) for k, v in state_dict.items()}
                for callback in self.saving_callbacks:
                    callback.save_state_dict(state_dict, epoch, steps, metadata=metadata)
                self.print("Model saved.")
            barrier("after_save")
            self.model.after_save_model()

    def call_preview_callbacks(self, epoch: int, steps: int) -> None:
        if self.preview_strategy.should_preview(epoch, steps):
            barrier("before_preview")
            self.model.before_preview()
            if len(self.preview_callbacks) > 0 and is_main_process():
                assert self.preview_dataloader is not None
                self.print("Generating preview images...")
                self._sync_model_params()
                for i, batch in enumerate(self.preview_dataloader):
                    self.model.before_preview_step()
                    preview = self.model.preview_step(batch, preview_index=i)
                    for callback in self.preview_callbacks:
                        callback.preview_image(preview, epoch, steps, i, metadata=batch)
                    self.model.after_preview_step()
                self.print("Preview done.")
            barrier("after_preview")
            self.model.after_preview()

    def debug_dataset(self) -> None:
        self.print("debugging train_dataloader...")
        for batch in self.train_dataloader:
            self.print({k: getattr(v, "shape", v) for k, v in batch.items()})

    def jax_configuration(self) -> None:
        precision = self.config.trainer.fp32_matmul_precision
        if precision is not None:
            jax.config.update(
                "jax_default_matmul_precision",
                {"highest": "highest", "high": "high", "medium": "bfloat16"}[precision],
            )

    # -- entry ---------------------------------------------------------------

    def train(self) -> None:
        if self.config.trainer.debug_nans:
            # SURVEY.md §5.2: the jax sanitizer analogue — jitted steps
            # re-run un-jitted on NaN and raise at the producing primitive
            jax.config.update("jax_debug_nans", True)
        self.before_train()
        if self.debug_mode == "dataset":
            return

        self.model.sanity_check()
        if self.debug_mode == "sanity_check":
            self.print("Sanity check done. Exiting...")
            return

        try:
            self.training_loop()
        finally:
            if self.trackers is not None:
                self.trackers.finish()
        self._sync_model_params()
        self.after_train()

    # -- logging -------------------------------------------------------------

    def print(self, *args, **kwargs) -> None:
        if is_main_process():
            print(*args, **kwargs)

    def log_dict(self, values: dict, step: Optional[int] = None) -> None:
        if self.trackers is not None and values:
            self.trackers.log(values, step=step)

    def _log_metadata(self, current_step: int) -> None:
        lr = self.schedule(current_step)
        self.model.log("lr/group_0", float(lr), on_step=True, on_epoch=False)
