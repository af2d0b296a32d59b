"""Native CLIP vision tower (HF CLIPVisionModel[WithProjection] layout).

The reference keeps vision backbones in torch (timm/transformers,
src/models/auto.py); this native JAX tower exists so losses can
differentiate THROUGH the encoder — the DRaFT+ reward path needs
d(reward)/d(pixels), which a host-side torch encoder cannot provide.

Param keys flatten to the HF state-dict layout
(vision_model.embeddings.{class_embedding,patch_embedding.weight,
position_embedding.weight}, vision_model.pre_layrnorm.* (sic — HF typo),
vision_model.encoder.layers.N.*, vision_model.post_layernorm.*,
visual_projection.weight) so CLIP/PickScore checkpoints load directly.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from ...nn import Embedding, LayerNorm, Linear, Module, ModuleDict, split_keys
from ...ops.attention import AttentionImplementation
from ..text_encoders.clip import CLIPEncoderLayer


@dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    num_channels: int = 3
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    projection_dim: int = 768
    attention_backend: AttentionImplementation = "xla"

    # the text-layer class reads these names; vision has no vocab
    @property
    def max_position_embeddings(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1


# PickScore_v1 / laion CLIP-H vision tower
PICKSCORE_VISION_CONFIG = CLIPVisionConfig(
    hidden_size=1280,
    intermediate_size=5120,
    num_hidden_layers=32,
    num_attention_heads=16,
    patch_size=14,
    hidden_act="gelu",
    projection_dim=1024,
)

# CLIP normalization constants (HF CLIPImageProcessor defaults)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


class CLIPVisionModel(Module):
    """__call__(params, pixel_values NHWC normalized) ->
    (last_hidden_state, pooled) where pooled = post-LN class token."""

    def __init__(self, config: CLIPVisionConfig):
        self.config = config
        n_pos = config.max_position_embeddings
        self.position_embedding = Embedding(n_pos, config.hidden_size)
        self.pre_layrnorm = LayerNorm(config.hidden_size, eps=config.layer_norm_eps)
        self.layers = ModuleDict(
            {str(i): CLIPEncoderLayer(config) for i in range(config.num_hidden_layers)}
        )
        self.post_layernorm = LayerNorm(config.hidden_size, eps=config.layer_norm_eps)

    def init(self, key, dtype=jnp.float32):
        cfg = self.config
        keys = split_keys(key, ["cls", "patch", "pos", "pre", "layers", "post"])
        d = cfg.hidden_size
        return {
            "vision_model": {
                "embeddings": {
                    "class_embedding": jax.random.normal(keys["cls"], (d,), dtype) * 0.02,
                    "patch_embedding": {
                        "weight": 0.02
                        * jax.random.normal(
                            keys["patch"],
                            (d, cfg.num_channels, cfg.patch_size, cfg.patch_size),
                            dtype,
                        )
                    },
                    "position_embedding": self.position_embedding.init(keys["pos"], dtype),
                },
                "pre_layrnorm": self.pre_layrnorm.init(keys["pre"], dtype),
                "encoder": {"layers": self.layers.init(keys["layers"], dtype)},
                "post_layernorm": self.post_layernorm.init(keys["post"], dtype),
            }
        }

    def _embed(self, params, pixel_values: jax.Array) -> jax.Array:
        cfg = self.config
        emb = params["vision_model"]["embeddings"]
        # non-overlapping patch conv == reshape + matmul (MXU-friendly)
        b, h, w, c = pixel_values.shape
        p = cfg.patch_size
        x = pixel_values.reshape(b, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b, (h // p) * (w // p), c * p * p)
        weight = emb["patch_embedding"]["weight"]
        wmat = weight.reshape(weight.shape[0], -1).astype(x.dtype)  # (D, C*p*p)
        patches = x @ wmat.T  # HF conv has no bias
        cls = jnp.broadcast_to(
            emb["class_embedding"].astype(x.dtype), (b, 1, cfg.hidden_size)
        )
        tokens = jnp.concatenate([cls, patches], axis=1)
        positions = jnp.arange(tokens.shape[1])
        return tokens + self.position_embedding(emb["position_embedding"], positions)

    def __call__(self, params, pixel_values: jax.Array):
        vm = params["vision_model"]
        x = self._embed(params, pixel_values)
        x = self.pre_layrnorm(vm["pre_layrnorm"], x)
        layers = vm["encoder"]["layers"]
        for i in range(self.config.num_hidden_layers):
            x = self.layers[str(i)](layers[str(i)], x, None)
        pooled = self.post_layernorm(vm["post_layernorm"], x[:, 0])
        return x, pooled


class CLIPVisionModelWithProjection(CLIPVisionModel):
    def __init__(self, config: CLIPVisionConfig):
        super().__init__(config)
        self.visual_projection = Linear(
            config.hidden_size, config.projection_dim, bias=False
        )

    def init(self, key, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        params = super().init(k1, dtype)
        params["visual_projection"] = self.visual_projection.init(k2, dtype)
        return params

    def __call__(self, params, pixel_values: jax.Array):
        last, pooled = super().__call__(params, pixel_values)
        image_embeds = self.visual_projection(params["visual_projection"], pooled)
        return last, image_embeds


def clip_preprocess(
    images: jax.Array, image_size: int = 224, antialias: bool = True
) -> jax.Array:
    """In-graph CLIP preprocessing: NHWC float in [-1, 1] -> resized,
    CLIP-normalized NHWC. Differentiable (bicubic resize)."""
    b = images.shape[0]
    x = (images.astype(jnp.float32) + 1.0) / 2.0  # [0, 1]
    x = jax.image.resize(
        x, (b, image_size, image_size, images.shape[-1]), method="cubic",
        antialias=antialias,
    )
    mean = jnp.asarray(CLIP_IMAGE_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_IMAGE_STD, jnp.float32)
    return (x - mean) / std
