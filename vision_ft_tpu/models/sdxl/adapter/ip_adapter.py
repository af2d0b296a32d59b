"""IP-Adapter for SDXL: image-prompt cross attention + model wrapper.

Behavioral spec: /root/reference/src/models/sdxl/adapter/ip_adapter.py
(1379 LoC). TPU-native form: adapter cross-attentions are CrossAttention
subclasses selected statically via the denoiser's pluggable
``cross_attention_class``; adapter weights live inline in the param tree
(``...attn2.to_k_ip.weight``) and the IPAdapterManager maps them to the
reference on-disk keys (``ip_adapter.{odd}.to_k_ip.weight``).

Variants (reference :30-998):
  original  — ip_tokens/ip_mask kwargs, base + ip_scale*ip attention,
              optional renorm; to_k_ip/to_v_ip init by copying base k/v.
  adaln_zero— ip tokens ride the *context tail*; SingleAdaLayerNormZero
              on ip tokens, zero-init gate from the time embedding.
  tanh_gate — context-tail ip tokens, zero-init per-channel tanh gate.
  gate      — context-tail ip tokens, zero-init linear gate.
  flamingo  — tanh_gate with a single scalar gate.
  time_gate — context-tail ip tokens, zero-init Linear(time_emb -> gate).
  peft      — original + LoRA subtrees on to_k_ip/to_v_ip (config.peft).

``skip_zero_tokens`` is a data-dependent branch in torch; under jit the ip
branch is computed and multiplied by (any nonzero) instead — identical
outputs, no dynamic control flow.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ....dataset.transform import ColorChannelSwap, PaddedResize, to_array
from ....modules.adapter.ip_adapter import IPAdapterConfig, IPAdapterManager
from ....modules.adapter.util import Adapter
from ....modules.norm import SingleAdaLayerNormZero
from ....modules.quant import is_quantized_weight
from ....nn import Linear, flatten_params, unflatten_params
from ....ops.attention import scaled_dot_product_attention
from ....utils import tensor as tensor_utils
from ....utils.state_dict import RegexMatch
from ..config import SDXLConfig
from ..denoiser import CrossAttention, Denoiser
from ..pipeline import SDXLModel

SDXL_TIME_EMBED_DIM = 1280


class IPAdapterCrossAttentionSDXL(CrossAttention, Adapter):
    target_key = RegexMatch(regex=r".*?(denoiser|diffusion_model).*\.attn2$")
    adapter_param_names = ("to_k_ip", "to_v_ip")

    def __init__(self, query_dim, context_dim, num_heads, head_dim, backend,
                 config: IPAdapterConfig, time_embedding_dim: int = SDXL_TIME_EMBED_DIM):
        super().__init__(query_dim, context_dim, num_heads, head_dim, backend)
        self.adapter_config = config
        self.time_embedding_dim = time_embedding_dim
        self.ip_scale = config.ip_scale
        self.num_ip_tokens = config.num_ip_tokens
        self.skip_zero_tokens = config.skip_zero_tokens
        self.attn_renorm = config.attn_renorm
        inner = num_heads * head_dim
        self.children["to_k_ip"] = Linear(context_dim, inner, bias=False)
        self.children["to_v_ip"] = Linear(context_dim, inner, bias=False)
        self._register_extra_children()

    def _register_extra_children(self):
        pass

    # -- adapter init (copy base k/v; reference :93-113) ----------------------

    @classmethod
    def init_adapter_subtree(cls, key, attn2_params, config: IPAdapterConfig, dtype,
                             time_embedding_dim: int = SDXL_TIME_EMBED_DIM):
        """Copy base to_k/to_v into the ip projections; quantized bases fall
        back to small-normal init like the reference (:93-113)."""
        out = {}
        for name, sub_key in zip(("to_k", "to_v"), jax.random.split(key)):
            base = attn2_params[name]["weight"]
            if is_quantized_weight(base):
                from ....modules.quant import dequantize_weight

                shape = dequantize_weight(base).shape
                weight = jax.random.normal(sub_key, shape, dtype) * 0.01 - 0.01
            else:
                weight = base.astype(dtype)
            out[f"{name}_ip"] = {"weight": weight}
        return out

    # -- attention pieces -------------------------------------------------------

    def _attend(self, params_name_q, query, key, value, mask=None):
        b, s, _ = query.shape
        sc = key.shape[1]
        h, d = self.num_heads, self.head_dim

        def heads(t, length):
            return t.reshape(b, length, h, d).transpose(0, 2, 1, 3)

        q, k, v = heads(query, s), heads(key, sc), heads(value, sc)
        if mask is not None:
            if mask.ndim == 2:
                mask = mask[:, None, None, :]
            mask = mask.astype(bool)
        attn = scaled_dot_product_attention(q, k, v, mask=mask, backend=self.backend)
        return attn.transpose(0, 2, 1, 3).reshape(b, s, h * d)

    @staticmethod
    def _renorm(original, new):
        o_norm = jnp.linalg.norm(original.astype(jnp.float32), axis=-1, keepdims=True)
        n_norm = jnp.linalg.norm(new.astype(jnp.float32), axis=-1, keepdims=True)
        return (new.astype(jnp.float32) * (o_norm / jnp.maximum(n_norm, 1e-12))).astype(new.dtype)

    def _maybe_skip_zero(self, ip_tokens, ip_hidden):
        if not self.skip_zero_tokens:
            return ip_hidden
        nonzero = jnp.any(ip_tokens != 0).astype(ip_hidden.dtype)
        return ip_hidden * nonzero

    # -- forward -------------------------------------------------------------------

    def __call__(self, params, x, context, ip_tokens=None, ip_mask=None, **kwargs):
        query = self["to_q"](params["to_q"], x)
        key = self["to_k"](params["to_k"], context)
        value = self["to_v"](params["to_v"], context)
        hidden = self._attend(params, query, key, value)

        if ip_tokens is not None:
            ip_key = self["to_k_ip"](params["to_k_ip"], ip_tokens)
            ip_value = self["to_v_ip"](params["to_v_ip"], ip_tokens)
            ip_hidden = self._attend(params, query, ip_key, ip_value, mask=ip_mask)
            ip_hidden = self._maybe_skip_zero(ip_tokens, ip_hidden)
            new_hidden = hidden + self.ip_scale * ip_hidden
            hidden = self._renorm(hidden, new_hidden) if self.attn_renorm else new_hidden

        return self["to_out"]["0"](params["to_out"]["0"], hidden)


class _ContextTailVariant(IPAdapterCrossAttentionSDXL):
    """Variants that take ip tokens from the context tail (reference
    adaln_zero/tanh_gate/gate/flamingo/time_gate forwards)."""

    def _split_context(self, context):
        return (
            context[:, : -self.num_ip_tokens, :],
            context[:, -self.num_ip_tokens :, :],
        )

    def _gate(self, params, ip_hidden, ip_tokens, time_embedding):
        raise NotImplementedError

    def _transform_ip_tokens(self, params, ip_tokens, time_embedding):
        return ip_tokens

    def __call__(self, params, x, context, time_embedding=None, **kwargs):
        text_context, ip_tokens = self._split_context(context)
        query = self["to_q"](params["to_q"], x)
        key = self["to_k"](params["to_k"], text_context)
        value = self["to_v"](params["to_v"], text_context)
        hidden = self._attend(params, query, key, value)

        ip_in = self._transform_ip_tokens(params, ip_tokens, time_embedding)
        ip_key = self["to_k_ip"](params["to_k_ip"], ip_in)
        ip_value = self["to_v_ip"](params["to_v_ip"], ip_in)
        ip_hidden = self._attend(params, query, ip_key, ip_value)
        ip_hidden = self._gate(params, ip_hidden, ip_tokens, time_embedding)
        ip_hidden = self._maybe_skip_zero(ip_tokens, ip_hidden)
        hidden = hidden + self.ip_scale * ip_hidden
        return self["to_out"]["0"](params["to_out"]["0"], hidden)


class IPAdapterCrossAttentionAdaLNZeroSDXL(_ContextTailVariant):
    adapter_param_names = ("to_k_ip", "to_v_ip", "norm")

    def _register_extra_children(self):
        self.norm = SingleAdaLayerNormZero(
            hidden_dim=self.children["to_k"].in_features,
            gate_dim=self.num_heads * self.head_dim,
            embedding_dim=self.time_embedding_dim,
        )
        self.children["norm"] = self.norm
        self._gate_cache = None

    def _transform_ip_tokens(self, params, ip_tokens, time_embedding):
        out = self.norm(params["norm"], ip_tokens, time_embedding)
        self._gate_cache = out.gate
        return out.hidden_states

    def _gate(self, params, ip_hidden, ip_tokens, time_embedding):
        return ip_hidden * self._gate_cache[:, None, :]

    @classmethod
    def init_adapter_subtree(cls, key, attn2_params, config, dtype,
                             time_embedding_dim: int = SDXL_TIME_EMBED_DIM):
        out = super().init_adapter_subtree(key, attn2_params, config, dtype)
        inner = attn2_params["to_q"]["weight"].shape[0]
        hidden = attn2_params["to_k"]["weight"].shape[1]
        norm = SingleAdaLayerNormZero(hidden, inner, time_embedding_dim)
        out["norm"] = norm.init(key, dtype)
        return out


class IPAdapterCrossAttentionTanhGateSDXL(_ContextTailVariant):
    adapter_param_names = ("to_k_ip", "to_v_ip", "tanh_gate")
    _gate_dim_is_scalar = False

    def _gate(self, params, ip_hidden, ip_tokens, time_embedding):
        w = params["tanh_gate"]["weight"].astype(ip_hidden.dtype)
        return ip_hidden * jnp.tanh(w)

    @classmethod
    def init_adapter_subtree(cls, key, attn2_params, config, dtype, **kw):
        out = super().init_adapter_subtree(key, attn2_params, config, dtype)
        inner = attn2_params["to_q"]["weight"].shape[0]
        dim = 1 if cls._gate_dim_is_scalar else inner
        out["tanh_gate"] = {"weight": jnp.zeros((dim,), dtype)}
        return out


class IPAdapterCrossAttentionFlamingoGateSDXL(IPAdapterCrossAttentionTanhGateSDXL):
    _gate_dim_is_scalar = True  # single scalar gate (reference :682-713)


class IPAdapterCrossAttentionGateSDXL(_ContextTailVariant):
    adapter_param_names = ("to_k_ip", "to_v_ip", "gate")

    def _gate(self, params, ip_hidden, ip_tokens, time_embedding):
        return ip_hidden * params["gate"]["weight"].astype(ip_hidden.dtype)

    @classmethod
    def init_adapter_subtree(cls, key, attn2_params, config, dtype, **kw):
        out = super().init_adapter_subtree(key, attn2_params, config, dtype)
        inner = attn2_params["to_q"]["weight"].shape[0]
        out["gate"] = {"weight": jnp.zeros((inner,), dtype)}
        return out


class IPAdapterCrossAttentionTimeGateSDXL(_ContextTailVariant):
    adapter_param_names = ("to_k_ip", "to_v_ip", "time_gate")

    def _register_extra_children(self):
        inner = self.num_heads * self.head_dim
        self.children["time_gate"] = Linear(self.time_embedding_dim, inner)

    def _gate(self, params, ip_hidden, ip_tokens, time_embedding):
        gate = self["time_gate"](params["time_gate"], time_embedding)
        return ip_hidden * gate[:, None, :].astype(ip_hidden.dtype)

    @classmethod
    def init_adapter_subtree(cls, key, attn2_params, config, dtype,
                             time_embedding_dim: int = SDXL_TIME_EMBED_DIM):
        out = super().init_adapter_subtree(key, attn2_params, config, dtype)
        inner = attn2_params["to_q"]["weight"].shape[0]
        out["time_gate"] = {
            "weight": jnp.zeros((inner, time_embedding_dim), dtype),
            "bias": jnp.zeros((inner,), dtype),
        }
        return out


class IPAdapterCrossAttentionPeftSDXL(IPAdapterCrossAttentionSDXL):
    """original variant + LoRA on the ip projections (reference :844-998):
    the LoRA subtrees are inserted by the model wrapper via config.peft and
    applied automatically by nn.core.Linear."""


VARIANT_CLASSES = {
    "original": IPAdapterCrossAttentionSDXL,
    "adaln_zero": IPAdapterCrossAttentionAdaLNZeroSDXL,
    "tanh_gate": IPAdapterCrossAttentionTanhGateSDXL,
    "gate": IPAdapterCrossAttentionGateSDXL,
    "flamingo": IPAdapterCrossAttentionFlamingoGateSDXL,
    "time_gate": IPAdapterCrossAttentionTimeGateSDXL,
    "peft": IPAdapterCrossAttentionPeftSDXL,
}


class SDXLModelWithIPAdapterConfig(SDXLConfig):
    adapter: IPAdapterConfig = IPAdapterConfig()


class SDXLModelWithIPAdapter(SDXLModel):
    """SDXL + image encoder + IP-Adapter manager + projector
    (reference :999-1379).

    ``image_encoder``: any callable mapping a preprocessed image batch
    (B, H, W, C in [-1, 1] numpy) -> (B, S, feature_dim) features. The
    reference instantiates a timm SigLIP; pass e.g. a host-side torch
    wrapper or a jax encoder."""

    config: SDXLModelWithIPAdapterConfig

    def __init__(self, config: SDXLModelWithIPAdapterConfig,
                 image_encoder: Optional[Callable] = None, **kwargs):
        adapter_cls = VARIANT_CLASSES[config.adapter.variant]
        if config.adapter.variant == "peft":
            assert config.adapter.peft is not None, (
                'peft config is required when using "peft" variant'
            )

        class _Denoiser(Denoiser):
            cross_attention_class = adapter_cls
            cross_attention_extra = {
                "config": config.adapter,
                "time_embedding_dim": config.denoiser.hidden_dim * 4,
            }

        self.denoiser_class = _Denoiser
        super().__init__(config, **kwargs)

        if image_encoder is None:
            enc_cfg = config.adapter.image_encoder
            if enc_cfg.type == "timm" and "siglip" in enc_cfg.model_name:
                # the reference default (timm SigLIP on the host GPU,
                # reference auto.py:103-148) runs natively on device here:
                # no torch in the training hot loop, and it works in
                # environments without timm at all
                from ...vision_encoders.siglip import (
                    JaxImageEncoder,
                    SigLIPVisionConfig,
                )

                image_encoder = JaxImageEncoder(
                    SigLIPVisionConfig(image_size=config.adapter.image_size),
                    feature_type=enc_cfg.feature_type,
                    hidden_state_index=enc_cfg.hidden_state_index,
                    mean=config.adapter.image_mean,
                    std=config.adapter.image_std,
                )
        self.encoder = image_encoder
        self.manager = IPAdapterManager(adapter_cls, config.adapter)
        self.manager.set_target_paths(self._attn2_paths())
        self.image_proj = self.manager.get_projector(
            attention_dim=config.denoiser.context_dim
        )
        self.preprocessor_resize = PaddedResize(
            max_size=config.adapter.image_size, fill=config.adapter.background_color
        )
        self.color_swap = ColorChannelSwap(
            swap=(2, 1, 0) if config.adapter.color_channel == "bgr" else (0, 1, 2),
            skip=config.adapter.color_channel == "rgb",
        )

    # -- structure ---------------------------------------------------------------

    def _attn2_paths(self) -> list[str]:
        """attn2 module paths in the reference's DFS replacement order."""
        paths = []

        def scan(list_name, lists):
            for i, layer_list in enumerate(lists):
                for j, (kind, module) in enumerate(layer_list):
                    if kind == "st":
                        n_blocks = len(module["transformer_blocks"].children)
                        for k in range(n_blocks):
                            paths.append(
                                f"{list_name}.blocks.{i}.{j}.transformer_blocks.{k}.attn2"
                            )

        scan("input_blocks", self.denoiser.input_lists)
        for j, (kind, module) in enumerate(self.denoiser.middle_list):
            if kind == "st":
                for k in range(len(module["transformer_blocks"].children)):
                    paths.append(f"middle_block.blocks.{j}.transformer_blocks.{k}.attn2")
        scan("output_blocks", self.denoiser.output_lists)
        return paths

    # -- adapter params ------------------------------------------------------------

    def init_adapter_params(self, key: jax.Array) -> None:
        """Insert adapter subtrees into denoiser params + init projector
        (reference init_adapter + manager.init_weights + image_proj init)."""
        from ..pipeline import _str_to_dtype

        dtype = _str_to_dtype(self.config.adapter.dtype)
        adapter_cls = VARIANT_CLASSES[self.config.adapter.variant]
        flat = dict(flatten_params(self.params["denoiser"]))
        tree = self.params["denoiser"]
        for path in self.manager.target_paths:
            key, sub = jax.random.split(key)
            node = tree
            for part in path.split("."):
                node = node[part]
            adapter = adapter_cls.init_adapter_subtree(
                sub, node, self.config.adapter, dtype,
                time_embedding_dim=self.config.denoiser.hidden_dim * 4,
            )
            for name, value in flatten_params(adapter).items():
                flat[f"{path}.{name}"] = value
        self.params["denoiser"] = unflatten_params(flat)

        key, sub = jax.random.split(key)
        self.params["image_proj"] = self.image_proj.init(sub, dtype)

        if self.config.adapter.variant == "peft" and self.config.adapter.peft is not None:
            from ....modules.peft import replace_to_peft_layer

            key, sub = jax.random.split(key)
            self.params["denoiser"] = replace_to_peft_layer(
                self.params["denoiser"],
                include_keys=["to_k_ip", "to_v_ip"],
                exclude_keys=[],
                config=self.config.adapter.peft,
                key=sub,
            )

    def load_adapter_params(self, state_dict: dict) -> None:
        """Load a saved adapter checkpoint (ip_adapter.* + image_proj.*)."""
        self.params["denoiser"] = self.manager.load_state_dict(
            self.params["denoiser"],
            {k: v for k, v in state_dict.items() if k.startswith("ip_adapter.")},
        )
        proj = {
            k[len("image_proj."):]: v
            for k, v in state_dict.items()
            if k.startswith("image_proj.")
        }
        if proj:
            self.params["image_proj"] = unflatten_params(proj)

    def get_adapter_state_dict(self) -> dict:
        out = self.manager.get_state_dict(self.params["denoiser"])
        out.update(
            {f"image_proj.{k}": v for k, v in flatten_params(self.params["image_proj"]).items()}
        )
        return out

    # -- reference image ---------------------------------------------------------------

    def preprocess_reference_image(self, reference_image, normalize: bool = True) -> np.ndarray:
        if isinstance(reference_image, Image.Image):
            reference_image = [reference_image]
        arrays = []
        for img in reference_image:
            resized = self.preprocessor_resize(img)
            arr = to_array(resized)  # HWC in [-1, 1]
            if not normalize:
                arr = (arr + 1.0) / 2.0
            arr = self.color_swap(arr)
            arrays.append(arr)
        return np.stack(arrays)

    def encode_reference_image(self, pixel_values, prompt_embeddings=None) -> jax.Array:
        assert self.encoder is not None, "no image encoder configured"
        features = jnp.asarray(np.asarray(self.encoder(pixel_values)))
        return self.image_proj(self.params["image_proj"], features.astype(self.dtype),
                               prompt_embeddings)

    # -- denoise step with ip kwargs ------------------------------------------------------

    def _denoise_step(
        self, params, latents, timestep, sigma, next_sigma, embeddings, pooled,
        original_size, target_size, crop_coords, cfg_scale, noise_seed, ip_tokens,
        ip_mask, do_cfg: bool,
    ):
        # ancestral noise drawn in-jit from the seed scalar (same values
        # as incremental_seed_randn; one dispatch per step)
        noise = tensor_utils._incremental_seed_randn_jit(
            noise_seed, latents.shape, jnp.float32
        )
        model_input = jnp.concatenate([latents, latents]) if do_cfg else latents
        model_input = self.scheduler.scale_model_input(model_input, sigma).astype(latents.dtype)
        batch = model_input.shape[0]
        noise_pred = self.denoiser(
            params, model_input, jnp.broadcast_to(timestep, (batch,)), embeddings,
            pooled, original_size, target_size, crop_coords,
            cross_attention_kwargs={"ip_tokens": ip_tokens, "ip_mask": ip_mask},
        )
        if do_cfg:
            positive, negative = jnp.split(noise_pred, 2)
            noise_pred = negative + cfg_scale * (positive - negative)
        new_latents = self.scheduler.ancestral_step(
            latents.astype(jnp.float32), noise_pred.astype(jnp.float32),
            sigma, next_sigma, noise,
        )
        return new_latents.astype(latents.dtype)

    # -- generate -----------------------------------------------------------------------------

    def generate(
        self,
        prompt,
        negative_prompt=None,
        reference_image=None,
        width: int = 768,
        height: int = 768,
        original_size=None,
        target_size=None,
        crop_coords_top_left=(0, 0),
        num_inference_steps: int = 20,
        cfg_scale: float = 3.5,
        max_token_length: int = 75,
        seed: Optional[int] = None,
        do_offloading: bool = False,
    ) -> list[Image.Image]:
        import functools

        do_cfg = cfg_scale > 1.0
        timesteps = self.scheduler.get_timesteps(num_inference_steps)
        sigmas = self.scheduler.get_sigmas(timesteps)
        prompts = list(prompt) if isinstance(prompt, (list, tuple)) else [prompt]
        num_prompts = len(prompts)
        original_size = original_size or (height, width)
        target_size = target_size or (height, width)

        encoder_output = self.text_encoder.encode_prompts(
            self.params["text_encoder"], prompts, negative_prompt,
            use_negative_prompts=do_cfg, max_token_length=max_token_length,
        )
        embeddings, pooled = self.prepare_encoder_hidden_states(encoder_output, do_cfg)
        embeddings = embeddings.astype(self.dtype)
        pooled = pooled.astype(self.dtype)
        batch_size = embeddings.shape[0]

        # reference-image tokens (reference :1258-1306)
        if reference_image is not None:
            pixel_values = self.preprocess_reference_image(reference_image)
            rng = np.random.default_rng(seed if seed is not None else 0)
            negative_image = np.clip(
                rng.standard_normal(pixel_values.shape, np.float32), -1.0, 1.0
            )
            both = np.concatenate([pixel_values, negative_image], axis=0)
            reference_embeddings = self.encode_reference_image(both, embeddings)
            ip_tokens = jnp.repeat(reference_embeddings, num_prompts, axis=0)
            ip_mask = jnp.ones((ip_tokens.shape[0], ip_tokens.shape[1]), bool)
        else:
            dim = embeddings.shape[-1]
            n_tok = self.manager.adapter_config.num_ip_tokens
            ip_tokens = jnp.zeros((batch_size, n_tok, dim), self.dtype)
            ip_mask = jnp.zeros((batch_size, n_tok), bool)
        ip_tokens = ip_tokens.astype(self.dtype)

        latents = self.prepare_latents(
            num_prompts, height, width, self.scheduler.get_max_noise_sigma(sigmas), seed
        )

        sizes = lambda t: jnp.broadcast_to(jnp.asarray(t, jnp.float32), (batch_size, 2))
        from ....nn.core import cached_jit

        step = cached_jit(
            self, f"ip_step_{do_cfg}",
            functools.partial(self._denoise_step, do_cfg=do_cfg),
        )
        noise_seed = seed if seed is not None else int(np.random.randint(0, 2**31 - 1))
        for i, t in enumerate(timesteps):
            latents = step(
                self.params["denoiser"], latents, jnp.float32(t),
                jnp.float32(sigmas[i]), jnp.float32(sigmas[i + 1]),
                embeddings, pooled, sizes(original_size), sizes(target_size),
                sizes(crop_coords_top_left), jnp.float32(cfg_scale),
                jnp.int32((noise_seed + 7919 * (i + 1)) & 0x7FFFFFFF),
                ip_tokens, ip_mask,
            )

        return self.decode_image(latents, use_tiling=max(height, width) >= 1536)
