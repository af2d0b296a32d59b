"""Bucket primitives + ARB math (reference behaviors, CPU-only)."""

import numpy as np
import pytest

from vision_ft_tpu.dataset.bucket import Bucket, BucketDataset
from vision_ft_tpu.dataset.aspect_ratio_bucket import (
    AspectRatioBucketManager,
    generate_buckets,
)


def test_generate_buckets_default_properties():
    buckets = generate_buckets(target_area=1024 * 1024, start_size=1024, step=64, min_size=384)
    assert buckets.ndim == 2 and buckets.shape[1] == 2
    # all divisible by step
    assert (buckets % 64 == 0).all()
    # contains the square and both orientations of non-squares
    as_tuples = {tuple(b) for b in buckets.tolist()}
    assert (1024, 1024) in as_tuples
    assert (1024, 960) in as_tuples and (960, 1024) in as_tuples
    assert (buckets >= 384).all()


def test_find_nearest_picks_fitting_bucket_with_closest_ar():
    buckets = generate_buckets(target_area=1024 * 1024, start_size=1024, step=64, min_size=384)
    mgr = AspectRatioBucketManager(buckets)
    # a 1536x1024 landscape photo: bucket must fit inside and be landscape
    idx = mgr.find_nearest(1536, 1024)
    w, h = buckets[idx]
    assert w <= 1536 and h <= 1024
    assert w / h > 1.0
    # square image -> square bucket
    w2, h2 = buckets[mgr.find_nearest(1024, 1024)]
    assert (w2, h2) == (1024, 1024)
    # too small -> assertion
    with pytest.raises(AssertionError):
        mgr.find_nearest(100, 100)


def test_bucket_modular_indexing_and_repeats():
    bucket = Bucket(items=list(range(10)), batch_size=4, num_repeats=3)
    assert len(bucket) == 30
    assert bucket[12] == 2  # wraps on num_items
    assert bucket[slice(8, 12)] == [8, 9, 0, 1]


def test_bucket_dataset_serves_whole_batches():
    bucket = Bucket(items=list(range(10)), batch_size=4)
    ds = BucketDataset(bucket)
    assert len(ds) == 3  # ceil(10/4)
    assert ds[0] == [0, 1, 2, 3]
    assert ds[2] == [8, 9, 0, 1]  # wraps like the reference
