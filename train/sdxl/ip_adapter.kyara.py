"""SDXL IP-Adapter Kyara-mode training CLI.

Reference entry point: /root/reference/train/sdxl/ip_adapter.kyara.py (bottom).
Usage: python train/sdxl/ip_adapter.kyara.py --config configs/sdxl/kyara.yml
"""

import click

from vision_ft_tpu.config import TrainConfig
from vision_ft_tpu.dataset.kyara import KyaraDatasetConfig
from vision_ft_tpu.dataset.preview import TextToImagePreviewConfig
from vision_ft_tpu.models.sdxl.train_ip_adapter import SDXLIPAdapterKyaraTraining
from vision_ft_tpu.trainer import Trainer


@click.command()
@click.option("--config", type=str, required=True)
def main(config: str):
    _config = TrainConfig.from_config_file(config)
    trainer = Trainer(_config)
    trainer.register_train_dataset_class(KyaraDatasetConfig)
    trainer.register_preview_dataset_class(TextToImagePreviewConfig)
    trainer.register_model_class(SDXLIPAdapterKyaraTraining)
    trainer.train()


if __name__ == "__main__":
    main()
