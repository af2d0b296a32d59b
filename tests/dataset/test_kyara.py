"""Kyara dataset: group-reference sampling, detection cropping, captions."""

import json

import numpy as np
import pytest
from PIL import Image

from vision_ft_tpu.dataset.kyara import (
    DetectionSamplingWeights,
    KyaraDatasetConfig,
    read_kyara_detections,
)


def _detections(general, rating="general", with_head=True):
    det = {
        "coords": {"top": 0, "left": 0, "right": 16, "bottom": 16,
                   "width": 16, "height": 16},
        "tags": {"rating": rating, "general": ["blue eyes"], "characters": ["a"]},
    }
    return {
        "heads": [det] if with_head else [],
        "upper_bodies": [det],
        "full_bodies": [],
        "whole_image_tags": {
            "rating": rating, "general": general, "characters": ["a"],
        },
    }


@pytest.fixture
def kyara_folder(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    folder = tmp_path / "kyara"
    folder.mkdir()
    rng = np.random.default_rng(0)
    ids = [101, 102, 103, 104]
    for id_ in ids:
        arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(folder / f"{id_}.webp")
        (folder / f"{id_}.json").write_text(
            json.dumps(_detections(["blue eyes", "smile", "outdoors"]))
        )
    table = pa.table(
        {
            "id": ids,
            "group": [[102, 103], [101], [104], [103]],
        }
    )
    pq.write_table(table, str(tmp_path / "groups.parquet"))
    return folder, tmp_path / "groups.parquet"


def test_read_detections(kyara_folder):
    folder, _ = kyara_folder
    det = read_kyara_detections(folder, "101")
    assert det is not None and len(det.heads) == 1
    assert read_kyara_detections(folder, "999") is None


def test_kyara_dataset_batches(kyara_folder):
    folder, parquet = kyara_folder
    config = KyaraDatasetConfig(
        folder=str(folder),
        group_parquet_path=str(parquet),
        batch_size=2,
        bucket_base_size=64,
        step=32,
        min_size=32,
        image_size=32,
        num_repeats=1,
    )
    ds = config.get_dataset()
    assert len(ds) > 0
    batch = ds[0]
    assert batch["image"].shape[1:] == (64, 64, 3)
    assert batch["reference_image"].shape[1:] == (32, 32, 3)
    # reference already normalized to [-1, 1]
    assert batch["reference_image"].min() >= -1.0 - 1e-5
    assert batch["reference_image"].max() <= 1.0 + 1e-5
    # caption = whole tags minus the detection's tags ("blue eyes" dropped)
    for caption in batch["caption"]:
        assert "blue eyes" not in caption
        assert "smile" in caption or "outdoors" in caption


def test_detection_fallback():
    from vision_ft_tpu.dataset.kyara import KyaraBucket, KyaraDetections

    bucket = KyaraBucket.__new__(KyaraBucket)
    bucket.sampling_weights = DetectionSamplingWeights()
    det = KyaraDetections.model_validate(_detections(["x"], with_head=False))
    # head pool is empty -> falls back to another part deterministically
    for _ in range(10):
        picked = bucket.choice_detection(det, [1.0, 0.5, 0.1])
        assert picked is not None  # recursion falls through to a nonempty pool
    empty = KyaraDetections.model_validate(
        {
            "heads": [], "upper_bodies": [], "full_bodies": [],
            "whole_image_tags": {"rating": "general", "general": [], "characters": []},
        }
    )
    assert bucket.choice_detection(empty, [1.0, 1.0, 1.0]) is None
