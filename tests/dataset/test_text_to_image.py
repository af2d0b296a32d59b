"""End-to-end folder dataset -> bucketed numpy batches."""

import json

import numpy as np
import pytest
from PIL import Image

from vision_ft_tpu.dataloader import get_dataloader_for_bucketing
from vision_ft_tpu.dataset.text_to_image import TextToImageDatasetConfig
from vision_ft_tpu.dataset.transform import ObjectCoverResize, PaddedResize, to_array


@pytest.fixture
def image_folder(tmp_path):
    rng = np.random.default_rng(0)
    sizes = [(96, 64), (64, 96), (80, 80), (100, 64), (64, 64)]
    for i, (w, h) in enumerate(sizes):
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img_{i}.png")
        (tmp_path / f"img_{i}.txt").write_text(f"caption {i}, tag")
    # one metadata-only pair with danbooru tags
    arr = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    Image.fromarray(arr).save(tmp_path / "meta.png")
    (tmp_path / "meta.json").write_text(
        json.dumps({"tag_string": "x", "tag_string_general": "1girl smile",
                    "tag_string_character": "miku", "rating": "s"})
    )
    # one skipped image
    Image.fromarray(arr).save(tmp_path / "skipme.png")
    (tmp_path / "skipme.json").write_text(json.dumps({"skip": True, "caption": "no"}))
    return tmp_path


def test_dataset_end_to_end(image_folder):
    config = TextToImageDatasetConfig(
        folder=str(image_folder),
        batch_size=2,
        bucket_base_size=64,
        step=32,
        min_size=32,
        num_repeats=1,
    )
    ds = config.get_dataset()
    assert len(ds) > 0
    loader = get_dataloader_for_bucketing(ds, shuffle=True, seed=0)
    seen_captions = []
    for batch in loader:
        img = batch["image"]
        assert img.ndim == 4 and img.shape[-1] == 3  # NHWC
        assert img.dtype == np.float32
        assert img.min() >= -1.0 and img.max() <= 1.0
        b = img.shape[0]
        assert batch["original_size"].shape == (b, 2)
        assert batch["target_size"].shape == (b, 2)
        assert batch["crop_coords_top_left"].shape == (b, 2)
        assert len(batch["caption"]) == b
        seen_captions += batch["caption"]
        # every image in a batch has one bucket shape
        assert img.shape[1] == batch["target_size"][0][0]
        assert img.shape[2] == batch["target_size"][0][1]
    # danbooru-format metadata: people ||| characters ||| general (empty
    # tag_string_copyright contributes an empty element, like the reference)
    assert any("1girl|||" in c and "miku" in c and "smile" in c for c in seen_captions)
    assert not any(c == "no" for c in seen_captions)  # skip flag honored


def test_dataloader_sharding_and_shuffle(image_folder):
    config = TextToImageDatasetConfig(
        folder=str(image_folder), batch_size=1,
        bucket_base_size=64, step=32, min_size=32,
    )
    ds = config.get_dataset()
    full = get_dataloader_for_bucketing(ds, shuffle=True, seed=1)
    n_total = len(full)
    shard0 = get_dataloader_for_bucketing(ds, shuffle=True, seed=1, process_index=0, process_count=2)
    shard1 = get_dataloader_for_bucketing(ds, shuffle=True, seed=1, process_index=1, process_count=2)
    assert len(shard0) + len(shard1) == n_total
    # same seed + epoch -> deterministic order
    a = [b["caption"] for b in shard0]
    b = [b["caption"] for b in shard0]
    assert a == b
    shard0.set_epoch(1)
    c = [b["caption"] for b in shard0]
    assert a != c  # reshuffles across epochs


def test_object_cover_resize_covers_target():
    img = Image.new("RGB", (100, 50))
    out = ObjectCoverResize(40, 40, do_upscale=False)(img)
    assert out.size[0] >= 40 and out.size[1] >= 40
    assert out.size[1] == 40  # height is the binding dimension
    with pytest.raises(ValueError):
        ObjectCoverResize(200, 200, do_upscale=False)(img)
    up = ObjectCoverResize(200, 200, do_upscale=True)(img)
    assert up.size[0] >= 200 and up.size[1] >= 200


def test_padded_resize_square():
    img = Image.new("RGB", (100, 50), (255, 0, 0))
    out = PaddedResize(64)(img)
    assert out.size == (64, 64)
    arr = to_array(out)
    assert arr.shape == (64, 64, 3)
    # top rows are padding (black = -1)
    assert float(arr[0].max()) == -1.0
