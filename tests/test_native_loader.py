"""Native async prefetcher tests: PNG decode parity with PIL, ordering,
stream-end semantics (reference behavior: missing frame ends the loop,
src/tracking.cpp:63-67)."""

import os

import numpy as np
import pytest
from PIL import Image

from svo_tpu.runtime import loader as native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader not built (make -C native)"
)


@pytest.fixture
def kitti_dir(tmp_path, rng):
    """Fake KITTI sequence: 6 stereo frames, color left / gray right."""
    (tmp_path / "image_2").mkdir()
    (tmp_path / "image_3").mkdir()
    frames = []
    for i in range(6):
        rgb = rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)
        gray = rng.integers(0, 255, (40, 60)).astype(np.uint8)
        Image.fromarray(rgb).save(tmp_path / "image_2" / f"{i:06d}.png")
        Image.fromarray(gray).save(tmp_path / "image_3" / f"{i:06d}.png")
        frames.append((rgb, gray))
    return tmp_path, frames


def test_decode_and_order(kitti_dir):
    root, frames = kitti_dir
    ld = native.AsyncStereoLoader(str(root), 0, 6, 40, 60, threads=3, capacity=4)
    got = list(ld)
    assert [i for i, _, _ in got] == list(range(6))
    for (idx, left, right), (rgb, gray) in zip(got, frames):
        # BT.601 luma parity with PIL's convert("L") (same coefficients)
        ref = np.asarray(Image.fromarray(rgb).convert("L"))
        assert np.abs(left.astype(int) - ref.astype(int)).max() <= 1
        np.testing.assert_array_equal(right, gray)


def test_pad_crop(kitti_dir):
    root, frames = kitti_dir
    # request larger canvas: zero-padded
    ld = native.AsyncStereoLoader(str(root), 0, 2, 48, 70, threads=1)
    _, left, _ = next(iter(ld))
    assert left.shape == (48, 70)
    assert left[40:].max() == 0 and left[:, 60:].max() == 0
    # request smaller canvas: cropped
    ld2 = native.AsyncStereoLoader(str(root), 0, 2, 20, 30, threads=1)
    _, left2, _ = next(iter(ld2))
    assert left2.shape == (20, 30)


def test_missing_frame_ends_stream(kitti_dir):
    root, _ = kitti_dir
    os.remove(root / "image_2" / "000003.png")
    ld = native.AsyncStereoLoader(str(root), 0, 6, 40, 60, threads=2)
    got = [i for i, _, _ in ld]
    assert got == [0, 1, 2]


def test_start_offset(kitti_dir):
    root, _ = kitti_dir
    ld = native.AsyncStereoLoader(str(root), 2, 5, 40, 60, threads=2)
    assert [i for i, _, _ in ld] == [2, 3, 4]
