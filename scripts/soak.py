"""KITTI-scale soak run: 2000+ frames through the chunked cadenced path.

Exercises the lifecycle claims the capacity sizing encodes
(svo_tpu/config.py Capacity / BaParams.ring_obs) that short runs never hit:
observation-ring wraparound interacting with window extraction, point-table
headroom, trajectory-slot usage — plus a mid-run checkpoint restored into a
fresh engine whose continuation must match the uninterrupted run.

Writes SOAK_r{N}.json with ATE, capacity high-water marks and the resume
verdict. Frames are rendered lazily per chunk (the 2400-frame KITTI-size
sequence would not fit in host RAM as a list).

    python scripts/soak.py --frames 2401               # TPU, ~25 min
    python scripts/soak.py --cpu --small --frames 121  # quick check
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--small", action="store_true")
parser.add_argument("--frames", type=int, default=2401)
parser.add_argument("--chunk", type=int, default=12)
parser.add_argument("--cadence", type=int, default=6)
parser.add_argument("--ckpt-at", type=int, default=0,
                    help="chunk index to checkpoint at (0 = halfway)")
parser.add_argument("--resume-chunks", type=int, default=4,
                    help="chunks to re-run from the checkpoint for the "
                         "equivalence check")
parser.add_argument("--out", type=str, default="")
args = parser.parse_args()

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if args.cpu:
    jax.config.update("jax_platforms", "cpu")
_ = jax.devices()

import numpy as np  # noqa: E402

from svo_tpu.config import Config  # noqa: E402
from svo_tpu.eval.trajectory import ate_rmse, rpe  # noqa: E402
from svo_tpu.geometry import camera as cam_mod  # noqa: E402
from svo_tpu.io.synthetic import SyntheticSequence  # noqa: E402
from svo_tpu.pipeline.odometry import StereoVO  # noqa: E402
from svo_tpu.utils import checkpoint  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
shape = (184, 320) if args.small else (376, 1241)
fx = 200.0 if args.small else 718.856
t_start = time.perf_counter()


def log(msg):
    print(f"[soak +{time.perf_counter() - t_start:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


seq = SyntheticSequence(n_frames=args.frames, shape=shape, fx=fx, speed=0.3)
cfg = Config(use_orb=False, image_height=shape[0], image_width=shape[1])
camera = cam_mod.from_intrinsics(
    seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2], seq.baseline
)

CH = args.chunk
n_chunks = (args.frames - 1) // CH
ckpt_at = args.ckpt_at or n_chunks // 2
ckpt_path = "/tmp/soak_ckpt.npz"


def u8(x):
    return np.clip(x, 0, 255).astype(np.uint8)


def render_chunk(c):
    ts = range(1 + c * CH, 1 + (c + 1) * CH)
    pairs = [seq.frame(t) for t in ts]
    return (np.stack([u8(l) for l, _ in pairs]),
            np.stack([u8(r) for _, r in pairs]))


vo = StereoVO(cfg, camera, chunk=CH, kf_cadence=args.cadence)
l0, r0 = seq.frame(0)
vo.start(l0, r0)
log(f"soak start: {args.frames} frames, {n_chunks} chunks of {CH}, "
    f"checkpoint at chunk {ckpt_at}")

hw = {"n_points": 0, "obs_cursor": 0}
compute_s = 0.0
for c in range(n_chunks):
    ls, rs = render_chunk(c)  # lazy render (not timed as compute)
    t0 = time.perf_counter()
    if c == ckpt_at:
        checkpoint.save_state(ckpt_path, vo.state)
    vo.state = vo._chunk_step(vo.state, ls, rs)
    if c in (0, n_chunks - 1) or c % 25 == 24:
        jax.block_until_ready(vo.state.pose)
        hw["n_points"] = max(hw["n_points"], int(vo.state.map.n_points))
        hw["obs_cursor"] = max(hw["obs_cursor"], int(vo.state.map.obs_cursor))
        compute_s += time.perf_counter() - t0
        if c % 25 == 24:
            log(f"chunk {c + 1}/{n_chunks}: pts={hw['n_points']} "
                f"obs_cursor={hw['obs_cursor']}")
    else:
        compute_s += time.perf_counter() - t0
jax.block_until_ready(vo.state.pose)

n = 1 + n_chunks * CH
est = np.asarray(vo.state.poses[:n])
gt = seq.gt_poses[:n]
traveled = float(np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1).sum())
ate = ate_rmse(est, gt)
rpe_t, rpe_r = rpe(est, gt)
hw["n_points"] = max(hw["n_points"], int(vo.state.map.n_points))
hw["obs_cursor"] = max(hw["obs_cursor"], int(vo.state.map.obs_cursor))
log(f"soak done: ATE {ate:.3f} m over {traveled:.0f} m, "
    f"{hw['n_points']} points, obs cursor {hw['obs_cursor']}")

# --- resume equivalence: restore the mid-run checkpoint into a FRESH engine
# and re-run a few chunks; trajectories must match the uninterrupted run ---
vo2 = StereoVO(cfg, camera, chunk=CH, kf_cadence=args.cadence)
vo2.start(l0, r0)
vo2.state = checkpoint.load_state(ckpt_path, vo2.state)
r_chunks = min(args.resume_chunks, n_chunks - ckpt_at)
for c in range(ckpt_at, ckpt_at + r_chunks):
    ls, rs = render_chunk(c)
    vo2.state = vo2._chunk_step(vo2.state, ls, rs)
jax.block_until_ready(vo2.state.pose)
n_res = 1 + (ckpt_at + r_chunks) * CH
resume_err = float(
    np.abs(np.asarray(vo2.state.poses[:n_res]) - est[:n_res]).max()
)
log(f"resume equivalence over {r_chunks} chunks: max |diff| {resume_err:.2e}")

ring = cfg.ba.ring_obs
result = {
    "metric": "soak_kitti_scale",
    "frames": n,
    "image": f"{shape[0]}x{shape[1]}",
    "chunk": CH,
    "kf_cadence": args.cadence,
    "ate_m": round(ate, 4),
    "ate_pct_of_traveled": round(100.0 * ate / traveled, 3),
    "rpe_trans_m": round(rpe_t, 4),
    "rpe_rot_deg": round(rpe_r, 4),
    "traveled_m": round(traveled, 1),
    "capacity": {
        "points_used": hw["n_points"],
        "points_capacity": cfg.capacity.max_points,
        "points_headroom_pct": round(
            100.0 * (1 - hw["n_points"] / cfg.capacity.max_points), 1
        ),
        "obs_written": hw["obs_cursor"],
        "obs_ring": ring,
        "ring_wraps": hw["obs_cursor"] // ring,
        "frames_used": n,
        "frames_capacity": cfg.capacity.max_frames,
    },
    "resume": {
        "checkpoint_chunk": ckpt_at,
        "chunks_rerun": r_chunks,
        "max_pose_diff": resume_err,
        "equivalent": bool(resume_err < 1e-5),
    },
    "fps_excl_render": round((n - 1) / compute_s, 1) if compute_s else None,
    "finite": bool(np.isfinite(est).all()),
}
out = args.out or os.path.join(REPO, "SOAK_r03.json")
with open(out, "w") as f:
    json.dump(result, f, indent=1)
print(json.dumps({k: result[k] for k in
                  ("metric", "frames", "ate_m", "ate_pct_of_traveled")}
                 | {"resume_ok": result["resume"]["equivalent"],
                    "ring_wraps": result["capacity"]["ring_wraps"]}))
log(f"wrote {out}")
