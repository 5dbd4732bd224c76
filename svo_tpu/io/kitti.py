"""KITTI odometry dataset access.

Replicates the reference's dataset contract:
- stereo frame layout ``image_2/%06d.png`` + ``image_3/%06d.png`` with
  grayscale conversion (reference: include/async_image_loader.h:55-69),
- ground-truth pose file: 12 floats per line, row-major 3x4 [R|t]
  (reference: src/map.cpp:15-43),
- calib.txt P2/P3 parsing lives in svo_tpu.geometry.camera.parse_kitti_calib
  (reference: src/main.cpp:12-35).

Decode is delegated to the native C++ prefetcher (svo_tpu.runtime.loader)
when built, with a Python fallback here.
"""

from __future__ import annotations

import os

import numpy as np


def frame_paths(root: str, idx: int) -> tuple[str, str]:
    """Left/right image paths for frame idx (reference layout,
    async_image_loader.h:55-66)."""
    name = f"{idx:06d}.png"
    return (
        os.path.join(root, "image_2", name),
        os.path.join(root, "image_3", name),
    )


def load_gray(path: str) -> np.ndarray:
    """Load an image as float32 grayscale HxW in [0,255].

    Mirrors cv::imread + BGR2GRAY (reference: async_image_loader.h:67-69).
    Uses the standard luma weights OpenCV uses for BGR2GRAY.
    """
    from PIL import Image

    img = Image.open(path)
    if img.mode != "L":
        img = img.convert("L")  # PIL uses ITU-R 601-2 luma, same as OpenCV
    return np.asarray(img, dtype=np.float32)


def parse_ground_truth(path: str) -> np.ndarray:
    """Parse KITTI poses file -> (F,4,4) float64 camera-to-world poses.

    Format: each line is 12 floats, the row-major top 3x4 of [R|t]
    (reference: src/map.cpp:15-43). Missing file -> empty array, matching the
    reference's print-and-continue behavior (src/map.cpp:18-21)."""
    if not os.path.exists(path):
        return np.zeros((0, 4, 4), dtype=np.float64)
    rows = np.loadtxt(path, dtype=np.float64)
    if rows.ndim == 1:
        rows = rows[None]
    F = rows.shape[0]
    poses = np.tile(np.eye(4, dtype=np.float64), (F, 1, 1))
    poses[:, :3, :4] = rows.reshape(F, 3, 4)
    return poses


class SequenceReader:
    """Synchronous stereo sequence reader (fallback path; the async native
    prefetcher in svo_tpu/runtime replaces this on the hot path)."""

    def __init__(self, root: str, start: int = 0, end: int | None = None):
        self.root = root
        self.start = start
        if end is None:
            files = sorted(os.listdir(os.path.join(root, "image_2")))
            end = len(files)
        self.end = end

    def __len__(self) -> int:
        return self.end - self.start

    def __iter__(self):
        for i in range(self.start, self.end):
            left, right = frame_paths(self.root, i)
            if not (os.path.exists(left) and os.path.exists(right)):
                return  # loop ends like the reference (tracking.cpp:63-67)
            yield i, load_gray(left), load_gray(right)
