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
parser.add_argument("--refine-every", type=int, default=0,
                    help="run global refinement (keyframe-block BA + "
                         "pose-graph) every N chunks (0 = off)")
parser.add_argument("--anchored", action="store_true",
                    help="keyframe-anchored KLT (TrackingParams.anchored_klt)")
parser.add_argument("--ba", action="store_true",
                    help="enable the in-pipeline keyframe-window BA "
                         "(cfg.ba.enabled) for the quantification table")
parser.add_argument("--device-window", type=int, default=80,
                    help="pre-stage this many mid-run chunks ON DEVICE and "
                         "time them exclusively — the chip-bound sustained "
                         "throughput over ~1000 frames with ring wraps and "
                         "refinement interleaved (0 = off)")
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
import dataclasses

if args.anchored:
    cfg = dataclasses.replace(
        cfg, tracking=dataclasses.replace(cfg.tracking, anchored_klt=True)
    )
if args.ba:
    cfg = dataclasses.replace(
        cfg, ba=dataclasses.replace(cfg.ba, enabled=True)
    )

# pre-rendered frame cache (scripts/render_cache.py): rendering dominates
# the soak's wall clock otherwise
_cache = None
if not args.small:
    from render_cache import open_cache

    _cache = open_cache(args.frames, shape, fx, 0.3, 7)
    if _cache is not None:
        log("using render cache")
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
    sl = slice(1 + c * CH, 1 + (c + 1) * CH)
    if _cache is not None:
        ls, rs, _ = _cache
        return np.ascontiguousarray(ls[sl]), np.ascontiguousarray(rs[sl])
    pairs = [seq.frame(t) for t in range(sl.start, sl.stop)]
    return (np.stack([u8(l) for l, _ in pairs]),
            np.stack([u8(r) for _, r in pairs]))


vo = StereoVO(cfg, camera, chunk=CH, kf_cadence=args.cadence)
if _cache is not None:
    l0 = _cache[0][0].astype(np.float32)
    r0 = _cache[1][0].astype(np.float32)
else:
    l0, r0 = seq.frame(0)
vo.start(l0, r0)
log(f"soak start: {args.frames} frames, {n_chunks} chunks of {CH}, "
    f"checkpoint at chunk {ckpt_at}")

refiner = None
if args.refine_every:
    import jax.numpy as jnp

    from svo_tpu.parallel.global_opt import refine_global

    K_mat = jnp.asarray(camera.K)
    bfx = jnp.float32(camera.K[0, 0] * camera.baseline)

    reject = float(os.environ.get("SOAK_REFINE_REJECT", "100.0"))
    # SOAK_JOINT_ALT=1 switches the conservative candidate to the joint
    # pose+point alternation (still points-only APPLICATION): measured
    # soak 0.110% @ every-2 / 0.115% @ every-3 vs 0.115% points-only, but
    # it perturbs short forward streams at the cm level (BENCH refined
    # per-stream), so the strictly non-regressive points-only alternation
    # is the default.
    joint_alt = bool(os.environ.get("SOAK_JOINT_ALT"))

    @jax.jit
    def _refine(mp, poses, fid):
        res = refine_global(
            mp, poses, fid, K_mat, bfx, reject_threshold=reject,
            alt_points_only=not joint_alt,
        )
        return res.map, res.poses, res.poses[fid], res.accepted

    def refiner(state):
        mp, poses, pose, acc = _refine(state.map, state.poses, state.frame_id)
        return state._replace(
            map=state.map._replace(points=mp.points), poses=poses, pose=pose
        ), acc

hw = {"n_points": 0, "obs_cursor": 0}
compute_s = 0.0
refine_accepts = 0
refine_calls = 0
# device-side throughput window: pre-stage [dev_lo, dev_hi) on the chip and
# time that whole span with one sync at each end — chip-bound sustained fps
# at realistic duration (VERDICT r03: the streaming fps below is tunnel-
# bound in this environment)
dev_w = min(args.device_window, n_chunks // 2)
dev_lo = n_chunks // 2
dev_hi = dev_lo + dev_w
staged = {}
device_s = None
for c in range(n_chunks):
    if dev_w and c == dev_lo:
        jax.block_until_ready(vo.state.pose)
        for cc in range(dev_lo, dev_hi):
            ls, rs = render_chunk(cc)
            staged[cc] = (jax.device_put(ls), jax.device_put(rs))
        jax.block_until_ready(staged[dev_hi - 1])
        t_dev = time.perf_counter()
    ls, rs = staged.pop(c) if c in staged else render_chunk(c)
    t0 = time.perf_counter()
    if c == ckpt_at:
        checkpoint.save_state(ckpt_path, vo.state)
    vo.state = vo._chunk_step(vo.state, ls, rs)
    if refiner is not None and (c + 1) % args.refine_every == 0:
        vo.state, acc = refiner(vo.state)
        refine_calls += 1
    if dev_w and c == dev_hi - 1:
        jax.block_until_ready(vo.state.pose)
        device_s = time.perf_counter() - t_dev
        log(f"device window: {dev_w * CH} frames in {device_s:.2f}s "
            f"({dev_w * CH / device_s:.1f} fps chip-bound)")
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
    if refiner is not None and (c + 1) % args.refine_every == 0:
        refine_accepts += int(np.asarray(acc))
jax.block_until_ready(vo.state.pose)

n = 1 + n_chunks * CH
est = np.asarray(vo.state.poses[:n])
gt = seq.gt_poses[:n]
traveled = float(np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1).sum())
ate = ate_rmse(est, gt)
rpe_t, rpe_r = rpe(est, gt)

# drift curve: unaligned position error + accumulated yaw error at
# checkpoints (where along the run does the error build?)
drift_curve = []
for f in range(0, n, max(1, n // 12)):
    perr = float(np.linalg.norm(est[f, :3, 3] - gt[f, :3, 3]))
    Rerr = est[f, :3, :3] @ gt[f, :3, :3].T
    ang = float(np.degrees(np.arccos(np.clip((np.trace(Rerr) - 1) / 2, -1, 1))))
    drift_curve.append({"frame": f, "pos_err_m": round(perr, 2),
                        "rot_err_deg": round(ang, 3)})

# per-frame health from the device metrics table
mrows = np.asarray(vo.state.metrics[1:n])
health = {
    "tracked_min": int(mrows[:, 0].min()),
    "tracked_p5": int(np.percentile(mrows[:, 0], 5)),
    "tracked_mean": round(float(mrows[:, 0].mean()), 1),
    "inlier_ratio_min": round(float(mrows[:, 1].min()), 3),
    "inlier_ratio_p5": round(float(np.percentile(mrows[:, 1], 5)), 3),
}
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
    if refiner is not None and (c + 1) % args.refine_every == 0:
        vo2.state, _ = refiner(vo2.state)
jax.block_until_ready(vo2.state.pose)
n_res = 1 + (ckpt_at + r_chunks) * CH
# with refinement on, the MAIN run's later refine calls retroactively
# adjust poses up to one refine span behind the rerun's stopping point —
# exclude that tail from the equivalence window (not nondeterminism)
n_cmp = n_res - (36 if args.refine_every else 0)
resume_err = float(
    np.abs(np.asarray(vo2.state.poses[:n_cmp]) - est[:n_cmp]).max()
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
    "rpe_rot_deg": round(float(np.degrees(rpe_r)), 4),
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
    # NOTE: this environment reaches the TPU through a network tunnel and
    # frames stream per chunk (~11 MB each), so this number is dominated by
    # host->device transfer, not device compute — bench.py (pre-staged
    # chunks) measures the chip's throughput.
    "fps_excl_render": round((n - 1) / compute_s, 1) if compute_s else None,
    # chip-bound sustained throughput: a mid-run window of pre-staged
    # chunks timed exclusively (ring wraps + refinement interleaved)
    "fps_device_sustained": round(dev_w * CH / device_s, 1) if device_s else None,
    "device_window_frames": dev_w * CH if device_s else 0,
    "finite": bool(np.isfinite(est).all()),
    "drift_curve": drift_curve,
    "health": health,
    "refine": {
        "every_chunks": args.refine_every,
        "calls": refine_calls,
        "accepted": refine_accepts,
    } if args.refine_every else None,
    # full resolved pipeline Config (VERDICT r04 item 7: artifacts must be
    # reproducible without cross-referencing docs)
    "resolved_config": dataclasses.asdict(cfg),
}
out = args.out or os.path.join(REPO, "SOAK_r05.json")
with open(out, "w") as f:
    json.dump(result, f, indent=1)
print(json.dumps({k: result[k] for k in
                  ("metric", "frames", "ate_m", "ate_pct_of_traveled")}
                 | {"resume_ok": result["resume"]["equivalent"],
                    "ring_wraps": result["capacity"]["ring_wraps"]}))
log(f"wrote {out}")
