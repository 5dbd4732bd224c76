"""Generate the checked-in mini KITTI-layout fixture dataset.

Renders a short synthetic stereo sequence and writes it in the exact
reference dataset contract (image_2/image_3 %06d.png grayscale, calib.txt
with P0-P3, poses.txt with row-major 3x4 per line — reference:
include/async_image_loader.h:55-66, src/main.cpp:12-35, src/map.cpp:15-43)
so the KITTI loaders, the native prefetcher, and examples/run_kitti.py can
run end-to-end in CI with no external data.

Deterministic: re-running reproduces identical bytes.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
from PIL import Image

from svo_tpu.io.synthetic import SyntheticSequence

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "tests", "fixtures", "kitti_mini")
N, H, W = 12, 96, 320
FX = 160.0


def main():
    seq = SyntheticSequence(n_frames=N, shape=(H, W), fx=FX, seed=7)
    os.makedirs(os.path.join(OUT, "image_2"), exist_ok=True)
    os.makedirs(os.path.join(OUT, "image_3"), exist_ok=True)
    for i, left, right in seq:
        for sub, img in (("image_2", left), ("image_3", right)):
            Image.fromarray(np.clip(img, 0, 255).astype(np.uint8), "L").save(
                os.path.join(OUT, sub, f"{i:06d}.png"), optimize=True
            )

    K = seq.K
    b = seq.baseline
    P2 = np.zeros((3, 4))
    P2[:3, :3] = K
    P3 = P2.copy()
    P3[0, 3] = -K[0, 0] * b  # right camera: P3 = K [I | -b e_x]
    with open(os.path.join(OUT, "calib.txt"), "w") as f:
        for name, P in (("P0", P2), ("P1", P3), ("P2", P2), ("P3", P3)):
            f.write(name + ": " + " ".join(f"{v:.6e}" for v in P.reshape(-1)) + "\n")

    with open(os.path.join(OUT, "poses.txt"), "w") as f:
        for T in seq.gt_poses:
            f.write(" ".join(f"{v:.6e}" for v in T[:3, :4].reshape(-1)) + "\n")

    total = sum(
        os.path.getsize(os.path.join(dp, fn))
        for dp, _, fns in os.walk(OUT) for fn in fns
    )
    print(f"fixture written to {OUT} ({total / 1024:.0f} KiB)")


if __name__ == "__main__":
    main()
