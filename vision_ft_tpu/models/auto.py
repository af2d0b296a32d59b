"""Auto image-encoder backbones (reference src/models/auto.py).

The reference wraps timm / transformers *torch* vision models as frozen
feature extractors for the IP-Adapter / PFG / style-tokenizer heads. In
this build the encoder stays a HOST-side torch module (it is frozen in
every reference trainer, so it never needs to live inside the jitted
program): ``AutoImageEncoder.__call__`` takes a numpy/torch pixel batch
and returns numpy features that the JAX projectors consume. Trainers run
it inside ``preprocess_batch``; pipelines run it before the compiled
denoise loop.

Any callable with the same contract can be substituted (the adapter
model classes accept ``image_encoder=``), which is how tests inject
mocks and how a future JAX-native SigLIP can slot in.
"""

from __future__ import annotations

from typing import Literal, Union

import numpy as np
from pydantic import BaseModel


class AbstractAutoModelConfig(BaseModel):
    type: str = "timm"
    model_name: str = ""
    config: dict = {}
    pretrained: bool = True

    feature_type: Literal["hidden_state", "pooler_output"] = "pooler_output"
    hidden_state_index: int = -1


class TransformersModelConfig(AbstractAutoModelConfig):
    type: Literal["transformers"] = "transformers"

    def load_model(self):
        from transformers import AutoConfig, AutoModel

        if self.pretrained:
            return AutoModel.from_pretrained(self.model_name, **self.config)
        return AutoModel.from_config(
            AutoConfig.from_pretrained(self.model_name, **self.config)
        )


class TimmModelConfig(AbstractAutoModelConfig):
    type: Literal["timm"] = "timm"
    model_name: str = "hf_hub:timm/vit_base_patch16_siglip_384.v2_webli"

    def load_model(self):
        try:
            import timm
        except ImportError as e:  # timm is not in the baked image
            raise ImportError(
                "timm is unavailable in this environment; pass a custom "
                "image_encoder callable to the adapter model instead"
            ) from e
        model = timm.create_model(
            self.model_name, pretrained=self.pretrained, **self.config
        )
        model.reset_classifier(0)
        return model


AutoModelConfig = Union[TransformersModelConfig, TimmModelConfig]


class AutoImageEncoder:
    """Host-side frozen feature extractor (reference auto.py:97-160).

    __call__: pixel batch (B, 3, H, W) numpy/torch in the encoder's
    normalized space -> numpy features (B, D) or (B, S, D).
    """

    def __init__(self, config: AutoModelConfig, lazy: bool = True):
        self.config = config
        self.model = None
        if not lazy:
            self._load_model()

    def _load_model(self) -> None:
        import torch

        self.model = self.config.load_model().eval()
        for p in self.model.parameters():
            p.requires_grad_(False)

    def __call__(self, pixel_values) -> np.ndarray:
        import torch

        if self.model is None:
            self._load_model()
        if isinstance(pixel_values, np.ndarray):
            pixel_values = torch.from_numpy(pixel_values)
        with torch.no_grad():
            if isinstance(self.config, TransformersModelConfig):
                outputs = self.model(pixel_values, output_hidden_states=True)
                if self.config.feature_type == "hidden_state":
                    features = outputs.hidden_states[self.config.hidden_state_index]
                else:
                    features = outputs.pooler_output
            else:  # timm
                if self.config.feature_type == "hidden_state":
                    features = self.model.forward_features(pixel_values)
                else:
                    features = self.model(pixel_values)
        return features.float().cpu().numpy()

    # torch-style no-ops so reference-shaped code can call them
    def eval(self):
        return self

    def requires_grad_(self, flag: bool = True):
        return self

    def state_dict(self):
        return {} if self.model is None else self.model.state_dict()

    def load_state_dict(self, state_dict, strict: bool = True, assign: bool = False):
        if self.model is None:
            self._load_model()
        self.model.load_state_dict(state_dict, strict=strict)
