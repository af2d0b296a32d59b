from .clip import CLIPTextConfig, CLIPTextModel, CLIPTextModelWithProjection

__all__ = ["CLIPTextConfig", "CLIPTextModel", "CLIPTextModelWithProjection"]
