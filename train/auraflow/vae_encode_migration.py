"""AuraFlow vae_encode_migration training CLI.

Reference entry point: /root/reference/train/auraflow/vae_encode_migration.py (bottom).
Usage: python train/auraflow/vae_encode_migration.py --config configs/auraflow/xxx.yml
"""

import click

from vision_ft_tpu.config import TrainConfig
from vision_ft_tpu.dataset.preview import TextToImagePreviewConfig
from vision_ft_tpu.dataset.text_to_image import TextToImageDatasetConfig
from vision_ft_tpu.models.auraflow.train_vae_encode_migration import AuraFlowForVAEEncoderMigrationTraining
from vision_ft_tpu.trainer import Trainer


@click.command()
@click.option("--config", type=str, required=True)
def main(config: str):
    _config = TrainConfig.from_config_file(config)
    trainer = Trainer(_config)
    trainer.register_train_dataset_class(TextToImageDatasetConfig)
    trainer.register_preview_dataset_class(TextToImagePreviewConfig)
    trainer.register_model_class(AuraFlowForVAEEncoderMigrationTraining)
    trainer.train()


if __name__ == "__main__":
    main()
