"""SDXL style_tokenizer training CLI.

Reference entry point: /root/reference/train/sdxl/style_tokenizer.py (bottom).
Usage: python train/sdxl/style_tokenizer.py --config configs/sdxl/xxx.yml
"""

import click

from vision_ft_tpu.config import TrainConfig
from vision_ft_tpu.dataset.preview import TextToImagePreviewConfig
from vision_ft_tpu.dataset.referenced_text_to_image import ReferencedTextToImageDatasetConfig
from vision_ft_tpu.models.sdxl.train_style_tokenizer import SDXLStyleTokenizerTraining
from vision_ft_tpu.trainer import Trainer


@click.command()
@click.option("--config", type=str, required=True)
def main(config: str):
    _config = TrainConfig.from_config_file(config)
    trainer = Trainer(_config)
    trainer.register_train_dataset_class(ReferencedTextToImageDatasetConfig)
    trainer.register_preview_dataset_class(TextToImagePreviewConfig)
    trainer.register_model_class(SDXLStyleTokenizerTraining)
    trainer.train()


if __name__ == "__main__":
    main()
