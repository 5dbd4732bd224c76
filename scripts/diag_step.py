"""Step-by-step diagnostic with internal state dumped per frame."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from svo_tpu.config import Config
from svo_tpu.geometry import camera as cam_mod
from svo_tpu.pipeline.odometry import StereoVO

N = int(os.environ.get("DIAG_FRAMES", "33"))
SHAPE = (376, 1241)
CACHE = f"/tmp/synth_cache_{N}_{SHAPE[0]}x{SHAPE[1]}.npz"

z = np.load(CACHE)
frames = [(i, z[f"l{i}"], z[f"r{i}"]) for i in range(N)]
gt, baseline, K = z["gt"], float(z["baseline"]), z["K"]

cfg = Config(use_orb=False, image_height=SHAPE[0], image_width=SHAPE[1])
camera = cam_mod.from_intrinsics(K[0, 0], K[1, 1], K[0, 2], K[1, 2], baseline)
vo = StereoVO(cfg, camera)
_, l0, r0 = frames[0]
vo.start(l0, r0)
prev_t = np.eye(4)
for i, l, r in frames[1:]:
    vo.process(l, r)
    st = vo.state
    pose = np.asarray(st.pose)
    m = np.asarray(st.metrics[i])
    err = np.linalg.norm(pose[:3, 3] - gt[i][:3, 3])
    gt_rel = np.linalg.norm(gt[i][:3, 3] - gt[i - 1][:3, 3])
    est_rel = np.linalg.norm(pose[:3, 3] - prev_t[:3, 3])
    # rotation error vs gt
    Rerr = pose[:3, :3].T @ gt[i][:3, :3]
    ang = np.degrees(np.arccos(np.clip((np.trace(Rerr) - 1) / 2, -1, 1)))
    print(
        f"{i:3d} err={err:8.3f} rot={ang:6.3f}deg step={est_rel:6.3f}(gt {gt_rel:.3f}) "
        f"ir={m[1]*100:5.1f}% trk={int(m[0]):4d} feats={int(m[2]):4d} kf={int(m[3])} "
        f"prior_ok={int(np.asarray(st.prior_ok))}"
    )
    prev_t = pose
