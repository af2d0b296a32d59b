"""CogView4 text-to-image training CLI (reference train/cogview4/text_to_image.py)."""

import click

from vision_ft_tpu.config import TrainConfig
from vision_ft_tpu.dataset.preview import TextToImagePreviewConfig
from vision_ft_tpu.dataset.text_to_image import TextToImageDatasetConfig
from vision_ft_tpu.models.cogview4.train_text_to_image import (
    CogView4ForTextToImageTraining,
)
from vision_ft_tpu.trainer import Trainer


@click.command()
@click.option("--config", type=str, required=True)
def main(config: str):
    _config = TrainConfig.from_config_file(config)
    trainer = Trainer(_config)
    trainer.register_train_dataset_class(TextToImageDatasetConfig)
    trainer.register_preview_dataset_class(TextToImagePreviewConfig)
    trainer.register_model_class(CogView4ForTextToImageTraining)
    trainer.train()


if __name__ == "__main__":
    main()
