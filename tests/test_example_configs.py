"""Every shipped example config validates against its workload's schemas.

Mirrors the reference's two-stage validation (SURVEY.md §5.6): generic
TrainConfig first, then the workload's model_config_class and the
registered dataset config class against the raw dicts.
"""

import pathlib

import pytest

from vision_ft_tpu.config import TrainConfig

ROOT = pathlib.Path(__file__).resolve().parent.parent

# config file -> (model training class path, dataset config class path)
CASES = {
    "configs/sdxl/text_to_image_lora.yml": (
        "vision_ft_tpu.models.sdxl.train_text_to_image:SDXLForTextToImageTraining",
        "vision_ft_tpu.dataset.text_to_image:TextToImageDatasetConfig",
    ),
    "configs/sdxl/flow_match.yml": (
        "vision_ft_tpu.models.sdxl.train_flow_match:SDXLForFlowMatchingTraining",
        "vision_ft_tpu.dataset.text_to_image:TextToImageDatasetConfig",
    ),
    "configs/sdxl/flow_match_x0.yml": (
        "vision_ft_tpu.models.sdxl.train_flow_match:SDXLForFlowMatchingTraining",
        "vision_ft_tpu.dataset.text_to_image:TextToImageDatasetConfig",
    ),
    "configs/sdxl/ip_adapter.yml": (
        "vision_ft_tpu.models.sdxl.train_ip_adapter:SDXLIPAdapterTraining",
        "vision_ft_tpu.dataset.referenced_text_to_image:ReferencedTextToImageDatasetConfig",
    ),
    "configs/sdxl/prompt_free.ref.yml": (
        "vision_ft_tpu.models.sdxl.train_prompt_free:SDXLPFGTraining",
        "vision_ft_tpu.dataset.referenced_text_to_image:ReferencedTextToImageDatasetConfig",
    ),
    "configs/sdxl/prompt_free.self.yml": (
        "vision_ft_tpu.models.sdxl.train_prompt_free:SDXLPFGTraining",
        "vision_ft_tpu.dataset.text_to_image:TextToImageDatasetConfig",
    ),
    "configs/sdxl/style_tokenizer.yml": (
        "vision_ft_tpu.models.sdxl.train_style_tokenizer:SDXLStyleTokenizerTraining",
        "vision_ft_tpu.dataset.referenced_text_to_image:ReferencedTextToImageDatasetConfig",
    ),
    "configs/sdxl/rope_distill.yml": (
        "vision_ft_tpu.models.sdxl.train_rope_distill:SDXLForRoPEDistillTraining",
        "vision_ft_tpu.dataset.text_to_image:TextToImageDatasetConfig",
    ),
    "configs/sdxl/draft_plus.yml": (
        "vision_ft_tpu.models.sdxl.train_draft_plus:SDXLForDRaFTPlusTraining",
        "vision_ft_tpu.dataset.text_to_image:TextToImageDatasetConfig",
    ),
    "configs/auraflow/text_to_image_lora.yml": (
        "vision_ft_tpu.models.auraflow.train_text_to_image:AuraFlowForTextToImageTraining",
        "vision_ft_tpu.dataset.text_to_image:TextToImageDatasetConfig",
    ),
    "configs/auraflow/shortcut.yml": (
        "vision_ft_tpu.models.auraflow.train_shortcut:AuraFlowForShortcutTraining",
        "vision_ft_tpu.dataset.text_to_image:TextToImageDatasetConfig",
    ),
    "configs/lumina2/text_to_image.yml": (
        "vision_ft_tpu.models.lumina2.train_text_to_image:Lumina2ForTextToImageTraining",
        "vision_ft_tpu.dataset.text_to_image:TextToImageDatasetConfig",
    ),
    "configs/lumina2/text_to_image_pp.yml": (
        "vision_ft_tpu.models.lumina2.train_text_to_image:Lumina2ForTextToImageTraining",
        "vision_ft_tpu.dataset.text_to_image:TextToImageDatasetConfig",
    ),
    "configs/cogview4/text_to_image.yml": (
        "vision_ft_tpu.models.cogview4.train_text_to_image:CogView4ForTextToImageTraining",
        "vision_ft_tpu.dataset.text_to_image:TextToImageDatasetConfig",
    ),
}


def _resolve(spec: str):
    import importlib

    mod, _, name = spec.partition(":")
    return getattr(importlib.import_module(mod), name)


@pytest.mark.parametrize("path", sorted(CASES))
def test_config_validates(path):
    cfg = TrainConfig.from_config_file(str(ROOT / path))
    model_cls, dataset_cls = (_resolve(s) for s in CASES[path])
    model_cls.model_config_class.model_validate(cfg.model)
    dataset_cls.model_validate(cfg.dataset)


def test_all_yml_configs_covered():
    known = {str(p.relative_to(ROOT)) for p in (ROOT / "configs").rglob("*.yml")}
    previews = {p for p in known if "preview" in p}
    assert set(CASES) == known - previews, (
        "add new configs to CASES: " f"{sorted((known - previews) ^ set(CASES))}"
    )
