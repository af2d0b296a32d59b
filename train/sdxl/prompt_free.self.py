"""SDXL prompt_free.self training CLI.

Reference entry point: /root/reference/train/sdxl/prompt_free.self.py (bottom).
Usage: python train/sdxl/prompt_free.self.py --config configs/sdxl/xxx.yml
"""

import click

from vision_ft_tpu.config import TrainConfig
from vision_ft_tpu.dataset.preview import TextToImagePreviewConfig
from vision_ft_tpu.dataset.text_to_image import TextToImageDatasetConfig
from vision_ft_tpu.models.sdxl.train_prompt_free import SDXLPFGSelfTraining
from vision_ft_tpu.trainer import Trainer


@click.command()
@click.option("--config", type=str, required=True)
def main(config: str):
    _config = TrainConfig.from_config_file(config)
    trainer = Trainer(_config)
    trainer.register_train_dataset_class(TextToImageDatasetConfig)
    trainer.register_preview_dataset_class(TextToImagePreviewConfig)
    trainer.register_model_class(SDXLPFGSelfTraining)
    trainer.train()


if __name__ == "__main__":
    main()
