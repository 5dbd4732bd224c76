"""Run the reference-equivalent CPU (OpenCV) pipeline over the SAME long
synthetic sequence as scripts/soak.py and record its drift — the baseline
the soak ATE should be judged against (the reference has no back-end either,
so both accumulate open-loop VO drift).

    python scripts/soak_ref.py --frames 1201 --out /tmp/soak_ref.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--frames", type=int, default=1201)
parser.add_argument("--out", type=str, default="/tmp/soak_ref.json")
args = parser.parse_args()

import jax  # noqa: E402  (initialize before cv2 — see tests/conftest.py)

jax.config.update("jax_platforms", "cpu")
_ = jax.devices()

import numpy as np  # noqa: E402

from svo_tpu.config import Config  # noqa: E402
from svo_tpu.eval.reference_cpu import ReferenceCpuPipeline  # noqa: E402
from svo_tpu.eval.trajectory import ate_rmse, rpe  # noqa: E402
from svo_tpu.geometry import camera as cam_mod  # noqa: E402
from svo_tpu.io.synthetic import SyntheticSequence  # noqa: E402

t_start = time.perf_counter()


def log(m):
    print(f"[ref-soak +{time.perf_counter() - t_start:7.1f}s] {m}",
          file=sys.stderr, flush=True)


shape = (376, 1241)
seq = SyntheticSequence(n_frames=args.frames, shape=shape, fx=718.856,
                        speed=0.3)
cfg = Config(use_orb=False, image_height=shape[0], image_width=shape[1])
camera = cam_mod.from_intrinsics(
    seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2], seq.baseline
)
ref = ReferenceCpuPipeline(
    cfg, np.asarray(camera.K), np.asarray(camera.P_left),
    np.asarray(camera.P_right)
)

# pre-rendered frame cache (scripts/render_cache.py)
from render_cache import open_cache  # noqa: E402

_cache = open_cache(args.frames, shape, 718.856, 0.3, 7)
if _cache is not None:
    log("using render cache")

proc_s = 0.0
for i in range(args.frames):
    if _cache is not None:
        l = _cache[0][i].astype(np.float32)
        r = _cache[1][i].astype(np.float32)
    else:
        l, r = seq.frame(i)
    t0 = time.perf_counter()
    ref.process(l, r)
    proc_s += time.perf_counter() - t0
    if i % 200 == 199:
        log(f"frame {i + 1}/{args.frames}")

est = np.stack(ref.poses)
gt = seq.gt_poses[: len(est)]
traveled = float(np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1).sum())
ate = ate_rmse(est, gt)
rpe_t, rpe_r = rpe(est, gt)
n = len(est)
drift_curve = []
for f in range(0, n, max(1, n // 12)):
    perr = float(np.linalg.norm(est[f, :3, 3] - gt[f, :3, 3]))
    Rerr = est[f, :3, :3] @ gt[f, :3, :3].T
    ang = float(np.degrees(np.arccos(np.clip((np.trace(Rerr) - 1) / 2, -1, 1))))
    drift_curve.append({"frame": f, "pos_err_m": round(perr, 2),
                        "rot_err_deg": round(ang, 3)})

result = {
    "metric": "soak_reference_cpu",
    "frames": n,
    "ate_m": round(ate, 4),
    "ate_pct_of_traveled": round(100.0 * ate / traveled, 3),
    "rpe_trans_m": round(rpe_t, 4),
    "rpe_rot_deg": round(float(np.degrees(rpe_r)), 4),
    "traveled_m": round(traveled, 1),
    "fps": round(n / proc_s, 2),
    "drift_curve": drift_curve,
    "finite": bool(np.isfinite(est).all()),
}
with open(args.out, "w") as f:
    json.dump(result, f, indent=1)
print(json.dumps({k: result[k] for k in
                  ("metric", "frames", "ate_m", "ate_pct_of_traveled", "fps")}))
log(f"wrote {args.out}")
