"""SDXL DRaFT+ reward training CLI.

Reference entry point: /root/reference/train/sdxl/draft_plus.py:303-320.
Usage: python train/sdxl/draft_plus.py --config configs/sdxl/draft.yml
"""

import click

from vision_ft_tpu.config import TrainConfig
from vision_ft_tpu.dataset.preview import TextToImagePreviewConfig
from vision_ft_tpu.dataset.text_to_image import TextToImageDatasetConfig
from vision_ft_tpu.models.sdxl.train_draft_plus import SDXLForDRaFTPlusTraining
from vision_ft_tpu.trainer import Trainer


@click.command()
@click.option("--config", type=str, required=True)
def main(config: str):
    _config = TrainConfig.from_config_file(config)
    trainer = Trainer(_config)
    trainer.register_train_dataset_class(TextToImageDatasetConfig)
    trainer.register_preview_dataset_class(TextToImagePreviewConfig)
    trainer.register_model_class(SDXLForDRaFTPlusTraining)
    trainer.train()


if __name__ == "__main__":
    main()
