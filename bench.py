"""Benchmark: frames/s per chip of the TPU-native VO pipeline vs the
reference-equivalent CPU (OpenCV) pipeline on the same synthetic sequence.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

- value: aggregate frames/s per chip — S independent VO streams batched on
  one chip (vmapped cadenced chunk step, device-resident, warm; compile
  excluded). Throughput-per-chip is the TPU-idiomatic serving measure.
- vs_baseline: value / the reference CPU pipeline's AGGREGATE frames/s on
  this host at matched concurrency (nproc concurrent reference processes —
  the honest chip-vs-host comparison; one TPU chip replaces a whole CPU
  host, not a single core). The single-process reference ratio (the
  reference binary as it actually runs, src/main.cpp:38-53) is reported in
  extra as vs_ref_single.
- extra: single-stream (latency-path) fps, per-stream ATEs including a
  REVERSED stream (catches vmap/cadence bugs a forward-only check would
  miss), reference CPU numbers, and BA solver iterations/s (the back-end
  the reference declared but never built, src/map.cpp:84-88).
"""

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax  # noqa: E402  (initialize before any cv2 import — see tests/conftest.py)

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
_ = jax.devices()

import numpy as np  # noqa: E402

from svo_tpu.config import Config  # noqa: E402
from svo_tpu.eval.trajectory import ate_rmse  # noqa: E402
from svo_tpu.geometry import camera as cam_mod  # noqa: E402
from svo_tpu.io.synthetic import SyntheticSequence  # noqa: E402
from svo_tpu.parallel.batched import BatchedStereoVO  # noqa: E402
from svo_tpu.pipeline.odometry import StereoVO  # noqa: E402

CHUNK = int(os.environ.get("BENCH_CHUNK", "12"))
CADENCE = int(os.environ.get("BENCH_CADENCE", "6"))
STREAMS = int(os.environ.get("BENCH_STREAMS", "8"))
# 1 bootstrap frame + k full chunks: avoids the single-step tail path
N_FRAMES = int(os.environ.get("BENCH_FRAMES", str(1 + 8 * CHUNK)))
SHAPE = (376, 1241)  # KITTI seq 00 image size
_T0 = time.perf_counter()


def _log(msg):
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _ref_cpu_worker(args):
    """One reference-CPU pipeline over the whole sequence (forked child)."""
    frames, cfg, K, P_left, P_right = args
    import cv2

    cv2.setNumThreads(1)  # measure process-level throughput, not oversubscription
    from svo_tpu.eval.reference_cpu import ReferenceCpuPipeline

    ref = ReferenceCpuPipeline(cfg, K, P_left, P_right)
    poses, wall, fps = ref.run(frames)
    return wall, len(poses)


def main():
    _log(f"rendering {N_FRAMES} frames...")
    seq = SyntheticSequence(n_frames=N_FRAMES, shape=SHAPE, fx=718.856)
    frames = list(seq)
    _log("render done")

    cfg = Config(use_orb=False, image_height=SHAPE[0], image_width=SHAPE[1])
    camera = cam_mod.from_intrinsics(
        seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2], seq.baseline
    )

    # --- single-stream (latency) path: warm-up run compiles bootstrap +
    #     cadenced chunk step on THIS instance; the timed run reuses them ---
    vo = StereoVO(cfg, camera, chunk=CHUNK, kf_cadence=CADENCE)
    vo.run_chunked(frames[: CHUNK + 1], preload=True)
    _log("single-stream warm-up (compile) done")
    res = vo.run_chunked(frames, preload=True)
    single_fps = (res.n_frames - 1) / res.total_time_s
    _log(f"single-stream timed run done: {single_fps:.2f} fps")
    ate = ate_rmse(res.poses, seq.gt_poses[: res.n_frames])

    # --- multi-stream (throughput) path: S independent streams vmapped on
    #     one chip. Even streams run the sequence forward, odd streams run it
    #     reversed (smooth but different motion -> realistic divergence) ---
    def u8(x):
        return np.clip(x, 0, 255).astype(np.uint8)

    streams = [frames if s % 2 == 0 else frames[::-1] for s in range(STREAMS)]
    l0 = np.stack([st[0][1] for st in streams])
    r0 = np.stack([st[0][2] for st in streams])
    rest = list(range(1, N_FRAMES))
    n_chunks = len(rest) // CHUNK
    chunks = []
    for c0 in range(0, n_chunks * CHUNK, CHUNK):
        ts = rest[c0 : c0 + CHUNK]
        lefts = np.stack([np.stack([u8(st[t][1]) for st in streams]) for t in ts])
        rights = np.stack([np.stack([u8(st[t][2]) for st in streams]) for t in ts])
        chunks.append((jax.device_put(lefts), jax.device_put(rights)))
    jax.block_until_ready(chunks)

    bvo = BatchedStereoVO(cfg, camera, STREAMS, chunk=CHUNK, kf_cadence=CADENCE)
    bvo.start(l0, r0)
    bvo.process_chunk(*chunks[0])  # compile
    jax.block_until_ready(bvo.state.pose)
    _log("multi-stream warm-up (compile) done")

    bvo.start(l0, r0)
    jax.block_until_ready(bvo.state.pose)
    t0 = time.perf_counter()
    for c in chunks:
        bvo.process_chunk(*c)
    jax.block_until_ready(bvo.state.pose)
    batch_total = time.perf_counter() - t0
    n_stepped = n_chunks * CHUNK
    agg_fps = STREAMS * n_stepped / batch_total
    _log(f"multi-stream timed run done: {agg_fps:.2f} frames/s aggregate "
         f"({STREAMS} streams)")
    trajs = bvo.trajectories(n_stepped + 1)
    gt_fwd = seq.gt_poses[: n_stepped + 1]
    gt_rev = seq.gt_poses[::-1][: n_stepped + 1]
    batch_ate_fwd = ate_rmse(trajs[0], gt_fwd)
    batch_ate_rev = ate_rmse(trajs[1], gt_rev) if STREAMS > 1 else float("nan")

    # --- BA solver throughput (reference back-end is an empty TODO loop,
    #     src/map.cpp:84-88): windowed problems extracted from the LIVE map
    #     the single-stream run just built ---
    import jax.numpy as jnp

    from svo_tpu.ba.solver import solve_ba
    from svo_tpu.ba.window import extract_window

    BA_ITERS = 10
    state = vo.state
    problem, _ = extract_window(
        state.map, state.poses, state.frame_id,
        n_cams=10, n_points=1024, n_obs=4096,
    )
    bfx = jnp.float32(camera.K[0, 0] * camera.baseline)
    ba_fn = jax.jit(
        lambda p: solve_ba(p, camera.K, bfx, iterations=BA_ITERS)
    )
    ba_res = jax.block_until_ready(ba_fn(problem))  # compile
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        ba_res = ba_fn(problem)
    jax.block_until_ready(ba_res.T_cw)
    ba_iter_per_s = BA_ITERS * reps / (time.perf_counter() - t0)
    n_ba_obs = int(np.asarray(problem.obs_valid).sum())
    _log(f"BA solver: {ba_iter_per_s:.1f} LM iterations/s "
         f"(10-cam window, {n_ba_obs} obs)")

    # --- reference CPU pipeline: single process (as the reference binary
    #     runs) and matched-aggregate (nproc concurrent processes) ---
    from svo_tpu.eval.reference_cpu import ReferenceCpuPipeline

    ref = ReferenceCpuPipeline(
        cfg, np.asarray(camera.K), np.asarray(camera.P_left),
        np.asarray(camera.P_right)
    )
    ref_poses, ref_wall, ref_fps = ref.run(frames)
    ref_ate = ate_rmse(ref_poses, seq.gt_poses[: len(ref_poses)])
    _log(f"reference CPU single-process run done: {ref_fps:.2f} fps")

    n_procs = os.cpu_count() or 1
    wargs = (frames, cfg, np.asarray(camera.K), np.asarray(camera.P_left),
             np.asarray(camera.P_right))
    ctx = mp.get_context("fork")
    t0 = time.perf_counter()
    with ctx.Pool(n_procs) as pool:
        results = pool.map(_ref_cpu_worker, [wargs] * n_procs)
    agg_wall = time.perf_counter() - t0
    cpu_agg_fps = sum(n - 1 for _, n in results) / agg_wall
    _log(f"reference CPU aggregate ({n_procs} procs) done: "
         f"{cpu_agg_fps:.2f} fps")

    print(
        json.dumps(
            {
                "metric": "vo_frames_per_s_per_chip",
                "value": round(agg_fps, 2),
                "unit": "frames/s",
                "vs_baseline": (
                    round(agg_fps / cpu_agg_fps, 2) if cpu_agg_fps > 0 else None
                ),
                "extra": {
                    "streams": STREAMS,
                    "chunk": CHUNK,
                    "kf_cadence": CADENCE,
                    "single_stream_fps": round(single_fps, 2),
                    "ref_cpu_fps_single": round(ref_fps, 2),
                    "ref_cpu_fps_aggregate": round(cpu_agg_fps, 2),
                    "ref_cpu_procs": n_procs,
                    "vs_ref_single": round(agg_fps / ref_fps, 2),
                    "single_vs_ref_single": round(single_fps / ref_fps, 2),
                    "ate_m": round(ate, 4),
                    "batch_ate_fwd_m": round(batch_ate_fwd, 4),
                    "batch_ate_rev_m": round(batch_ate_rev, 4),
                    "ref_ate_m": round(ref_ate, 4),
                    "ba_iterations_per_s": round(ba_iter_per_s, 1),
                    "ba_window_obs": n_ba_obs,
                    "frames": res.n_frames,
                    "image": f"{SHAPE[0]}x{SHAPE[1]}",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
