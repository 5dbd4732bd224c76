"""Benchmark: frames/s per chip of the TPU-native VO pipeline vs the
reference-equivalent CPU (OpenCV) pipeline on the same synthetic sequence.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
- value: aggregate frames/s per chip — S independent VO streams batched on
  one chip (vmapped step, device-resident chunked scan, warm; compile
  excluded). Throughput-per-chip is the TPU-idiomatic serving measure; the
  single-stream (latency) fps is reported in extra.
- vs_baseline: ratio over the reference CPU pipeline's frames/s measured on
  this host (the reference publishes no numbers — BASELINE.md — so the
  denominator is measured here with the same OpenCV calls/params the
  reference uses, single stream exactly as the reference binary runs).
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
from svo_tpu.parallel.batched import BatchedStereoVO  # noqa: E402
from svo_tpu.pipeline.odometry import StereoVO  # noqa: E402

CHUNK = int(os.environ.get("BENCH_CHUNK", "16"))
STREAMS = int(os.environ.get("BENCH_STREAMS", "8"))
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

    # --- single-stream (latency) path: warm-up run compiles bootstrap +
    #     chunk step on THIS instance; the timed run reuses them ---
    vo = StereoVO(cfg, camera, chunk=CHUNK)
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

    bvo = BatchedStereoVO(cfg, camera, STREAMS, chunk=CHUNK)
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
    batch_ate = ate_rmse(trajs[0], seq.gt_poses[: n_stepped + 1])

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
                "value": round(agg_fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(agg_fps / ref_fps, 2) if ref_fps > 0 else None,
                "extra": {
                    "streams": STREAMS,
                    "single_stream_fps": round(single_fps, 2),
                    "ref_cpu_fps": round(ref_fps, 2),
                    "ate_m": round(ate, 4),
                    "batch_stream0_ate_m": round(batch_ate, 4),
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
