"""SDXL IP-Adapter training, self-reference mode
(reference train/sdxl/ip_adapter.self.py)."""

import click

from vision_ft_tpu.config import TrainConfig
from vision_ft_tpu.dataset.preview import TextToImagePreviewConfig
from vision_ft_tpu.dataset.text_to_image import TextToImageDatasetConfig
from vision_ft_tpu.models.sdxl.train_ip_adapter import SDXLIPAdapterSelfTraining
from vision_ft_tpu.trainer import Trainer


@click.command()
@click.option("--config", type=str, required=True)
def main(config: str):
    _config = TrainConfig.from_config_file(config)
    trainer = Trainer(_config)
    trainer.register_train_dataset_class(TextToImageDatasetConfig)
    trainer.register_preview_dataset_class(TextToImagePreviewConfig)
    trainer.register_model_class(SDXLIPAdapterSelfTraining)
    trainer.train()


if __name__ == "__main__":
    main()
