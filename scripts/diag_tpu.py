"""Diagnostic: per-frame health of the VO pipeline on the current JAX backend.

Renders (and caches to /tmp) a synthetic KITTI-sized sequence, runs the
pipeline, and prints per-frame translation error vs GT plus the health
metrics, to localize where a run diverges. Compare TPU vs
JAX_PLATFORMS=cpu outputs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import numpy as np

from svo_tpu.config import Config
from svo_tpu.geometry import camera as cam_mod
from svo_tpu.io.synthetic import SyntheticSequence
from svo_tpu.pipeline.odometry import StereoVO

N = int(os.environ.get("DIAG_FRAMES", "33"))
CHUNK = int(os.environ.get("DIAG_CHUNK", "16"))
SHAPE = (376, 1241)
CACHE = f"/tmp/synth_cache_{N}_{SHAPE[0]}x{SHAPE[1]}.npz"


def load_frames():
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        frames = [(i, z[f"l{i}"], z[f"r{i}"]) for i in range(N)]
        return frames, z["gt"], float(z["baseline"]), z["K"]
    seq = SyntheticSequence(n_frames=N, shape=SHAPE, fx=718.856)
    frames = list(seq)
    data = {}
    for i, l, r in frames:
        data[f"l{i}"] = l
        data[f"r{i}"] = r
    np.savez(CACHE, gt=seq.gt_poses, baseline=seq.baseline, K=seq.K, **data)
    return frames, seq.gt_poses, seq.baseline, seq.K


def main():
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    t0 = time.perf_counter()
    frames, gt, baseline, K = load_frames()
    print(f"frames ready +{time.perf_counter()-t0:.1f}s", file=sys.stderr)
    cfg = Config(use_orb=False, image_height=SHAPE[0], image_width=SHAPE[1])
    camera = cam_mod.from_intrinsics(K[0, 0], K[1, 1], K[0, 2], K[1, 2], baseline)
    vo = StereoVO(cfg, camera, chunk=CHUNK)
    res = vo.run_chunked(frames, preload=True)
    print(f"run done +{time.perf_counter()-t0:.1f}s", file=sys.stderr)
    # per-frame translation error (aligned to first pose, both start at I)
    for i in range(res.n_frames):
        te = np.linalg.norm(res.poses[i][:3, 3] - gt[i][:3, 3])
        m = res.metrics[i]
        print(
            f"{i:3d} err={te:8.3f}m ir={m[1]*100:5.1f}% feats={int(m[2]):4d} "
            f"kf={int(m[3])} mps={int(m[4]):5d}"
        )


if __name__ == "__main__":
    main()
