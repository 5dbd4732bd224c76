"""Pipeline-level fused-vs-XLA trajectory agreement (VERDICT r04 weak #3).

The fused LK-level kernel's parity tests are kernel-level and ok-masked;
the round-4 validity-gate interaction bug was only found by ad-hoc
bisection. This drives the FULL per-frame pipeline step twice over the
same short synthetic sequence — once on the XLA blend path, once with the
fused kernel forced in Pallas interpret mode (SVO_TPU_FUSED_INTERPRET,
CPU-runnable) — and requires trajectory-level agreement.

Subprocess-based: the path selection is read at module import
(ops/klt.py), so each engine runs in a fresh interpreter.
"""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = r"""
import json, os, sys
sys.path.insert(0, "@REPO@")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from svo_tpu.config import Config
from svo_tpu.geometry import camera as cam_mod
from svo_tpu.io.synthetic import SyntheticSequence
from svo_tpu.pipeline.odometry import StereoVO

H, W = 96, 256
seq = SyntheticSequence(n_frames=8, shape=(H, W), fx=120.0, speed=0.12,
                        seed=3)
cfg = Config(use_orb=False, image_height=H, image_width=W)
cam = cam_mod.from_intrinsics(
    seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2], seq.baseline
)
vo = StereoVO(cfg, cam)
res = vo.run(list(seq))
out = {
    "poses": np.asarray(res.poses).tolist(),
    "live": np.asarray(res.metrics[1:, 2]).tolist(),
}
print("RESULT:" + json.dumps(out))
"""


def _run(env_extra):
    env = dict(os.environ, JAX_PLATFORMS="", **env_extra)
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER.replace("@REPO@", REPO)],
        capture_output=True, text=True, timeout=1500, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")][0]
    d = json.loads(line[len("RESULT:"):])
    return np.asarray(d["poses"]), np.asarray(d["live"])


def test_fused_pipeline_matches_xla_trajectory():
    poses_x, live_x = _run({"SVO_TPU_NO_PALLAS": "1"})
    poses_f, live_f = _run({"SVO_TPU_FUSED_INTERPRET": "1"})

    # both engines must actually track (not limp through on dead features)
    assert live_x.min() > 40 and live_f.min() > 40
    # the round-4 roll-shift bug killed HALF the fused path's features
    # (garbage patches) — feature survival must be comparable. ~20% fewer
    # at this tiny resolution is legitimate (the fused kernel's tighter
    # iteration-travel budget kills marginal border tracks the XLA patch
    # clamp tolerates); 50% was the bug signature.
    assert live_f.mean() > 0.7 * live_x.mean(), (live_f.mean(), live_x.mean())

    # trajectory agreement at CATASTROPHE bounds: the engines legitimately
    # differ at the sub-pixel level (different travel clamps /
    # frozen-failure semantics), which integrates to a few cm at this tiny
    # resolution; the r04 corruption bug showed up as ~1 m of ATE. Bound
    # well above legitimate divergence, well below the failure mode.
    dt = np.linalg.norm(poses_x[:, :3, 3] - poses_f[:, :3, 3], axis=-1)
    assert dt.max() < 0.1, f"trajectories diverge: {dt}"

    for a, b in zip(poses_x, poses_f):
        R = a[:3, :3].T @ b[:3, :3]
        ang = np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1)))
        assert ang < 1.0, f"rotation diverges: {ang} deg"
