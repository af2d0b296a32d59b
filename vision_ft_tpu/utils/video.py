"""Video writing helpers (reference src/utils/video.py — cv2 VideoWriter)."""

from __future__ import annotations

import tempfile
from typing import Literal

import numpy as np
from PIL import Image


def write_images_as_video(
    images: list[Image.Image],
    output_path: str,
    fps: int,
    codec: Literal["mp4v", "h264", "avc1"] = "mp4v",
) -> None:
    import cv2

    width, height = images[0].size
    fourcc = cv2.VideoWriter.fourcc(*codec)
    writer = cv2.VideoWriter(output_path, fourcc, fps, (width, height))
    if not writer.isOpened():
        raise RuntimeError(f"Could not open video writer for {output_path}")
    try:
        for img in images:
            frame = np.array(img.convert("RGB"))
            writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    finally:
        writer.release()


def write_images_as_temp_video(
    images: list[Image.Image],
    fps: int = 30,
    codec: Literal["mp4v", "h264", "avc1"] = "mp4v",
) -> str:
    with tempfile.NamedTemporaryFile(suffix=".mp4", delete=False) as temp_file:
        output_path = temp_file.name
    write_images_as_video(images, output_path, fps, codec)
    return output_path
