"""Benchmark: frames/s per chip of the TPU-native VO pipeline vs the
reference-equivalent CPU (OpenCV) pipeline on the same synthetic sequence.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
- value: frames/s of the TPU pipeline (chunked device-resident execution,
  warm — compile excluded).
- vs_baseline: ratio over the reference CPU pipeline's frames/s measured on
  this host (the reference publishes no numbers — BASELINE.md — so the
  denominator is measured here with the same OpenCV calls/params the
  reference uses).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402  (initialize before any cv2 import — see tests/conftest.py)

_ = jax.devices()

import numpy as np  # noqa: E402

from svo_tpu.config import Config  # noqa: E402
from svo_tpu.eval.trajectory import ate_rmse  # noqa: E402
from svo_tpu.geometry import camera as cam_mod  # noqa: E402
from svo_tpu.io.synthetic import SyntheticSequence  # noqa: E402
from svo_tpu.pipeline.odometry import StereoVO  # noqa: E402

CHUNK = int(os.environ.get("BENCH_CHUNK", "16"))
# 1 bootstrap frame + k full chunks: avoids compiling the single-step tail path
N_FRAMES = int(os.environ.get("BENCH_FRAMES", str(1 + 6 * CHUNK)))
SHAPE = (376, 1241)  # KITTI seq 00 image size


def _log(msg):
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def main():
    _log(f"rendering {N_FRAMES} frames...")
    seq = SyntheticSequence(n_frames=N_FRAMES, shape=SHAPE, fx=718.856)
    frames = list(seq)
    _log("render done")

    cfg = Config(use_orb=False, image_height=SHAPE[0], image_width=SHAPE[1])
    camera = cam_mod.from_intrinsics(
        seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2], seq.baseline
    )

    # --- TPU pipeline: warm-up run (compile), then timed run ---
    vo = StereoVO(cfg, camera, chunk=CHUNK)
    warm = frames[: CHUNK + 1]
    vo.run_chunked(warm, preload=True)  # compiles bootstrap + chunk step
    _log("warm-up (compile) done")
    vo2 = StereoVO(cfg, camera, chunk=CHUNK)
    res = vo2.run_chunked(frames, preload=True)
    tpu_fps = (res.n_frames - 1) / res.total_time_s
    _log(f"timed run done: {tpu_fps:.2f} fps")
    ate = ate_rmse(res.poses, seq.gt_poses[: res.n_frames])

    # --- reference CPU pipeline on the same frames ---
    from svo_tpu.eval.reference_cpu import ReferenceCpuPipeline

    ref = ReferenceCpuPipeline(
        cfg, np.asarray(camera.K), np.asarray(camera.P_left), np.asarray(camera.P_right)
    )
    ref_poses, ref_wall, ref_fps = ref.run(frames)
    ref_ate = ate_rmse(ref_poses, seq.gt_poses[: len(ref_poses)])
    _log(f"reference CPU run done: {ref_fps:.2f} fps")

    print(
        json.dumps(
            {
                "metric": "vo_frames_per_s_per_chip",
                "value": round(tpu_fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(tpu_fps / ref_fps, 2) if ref_fps > 0 else None,
                "extra": {
                    "ref_cpu_fps": round(ref_fps, 2),
                    "ate_m": round(ate, 4),
                    "ref_ate_m": round(ref_ate, 4),
                    "frames": res.n_frames,
                    "image": f"{SHAPE[0]}x{SHAPE[1]}",
                    "chunk": CHUNK,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
