"""Time the batched cadenced chunk step on the current backend.

One bootstrap compile + one chunk-step compile, then a timed warm run.
Frames are cached under /tmp so repeated invocations skip the render.

    python scripts/bench_batched.py --streams 8 --chunk 12 --cadence 6
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--streams", type=int, default=8)
parser.add_argument("--chunk", type=int, default=12)
parser.add_argument("--cadence", type=int, default=6)
parser.add_argument("--frames", type=int, default=0, help="0 -> 1 + 4*chunk")
parser.add_argument("--height", type=int, default=376)
parser.add_argument("--width", type=int, default=1241)
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
_ = jax.devices()

import numpy as np

from svo_tpu.config import Config
from svo_tpu.eval.trajectory import ate_rmse
from svo_tpu.geometry import camera as cam_mod
from svo_tpu.parallel.batched import BatchedStereoVO

N = args.frames or (1 + 4 * args.chunk)
SHAPE = (args.height, args.width)
CACHE = f"/tmp/synth_cache_{N}_{SHAPE[0]}x{SHAPE[1]}.npz"
T0 = time.perf_counter()


def log(m):
    print(f"[+{time.perf_counter() - T0:6.1f}s] {m}", file=sys.stderr, flush=True)


if os.path.exists(CACHE):
    z = np.load(CACHE)
    frames = [(i, z[f"l{i}"], z[f"r{i}"]) for i in range(N)]
    baseline, K, gt = float(z["baseline"]), z["K"], z["gt"]
else:
    from svo_tpu.io.synthetic import SyntheticSequence

    seq = SyntheticSequence(n_frames=N, shape=SHAPE, fx=718.856)
    frames = list(seq)
    data = {f"l{i}": l for i, l, _ in frames}
    data.update({f"r{i}": r for i, _, r in frames})
    np.savez(CACHE, gt=seq.gt_poses, baseline=seq.baseline, K=seq.K, **data)
    baseline, K, gt = float(seq.baseline), seq.K, seq.gt_poses
log(f"{N} frames ready")

cfg = Config(use_orb=False, image_height=SHAPE[0], image_width=SHAPE[1])
camera = cam_mod.from_intrinsics(K[0, 0], K[1, 1], K[0, 2], K[1, 2], baseline)
S, CH = args.streams, args.chunk

streams = [frames if s % 2 == 0 else frames[::-1] for s in range(S)]
l0 = np.stack([st[0][1] for st in streams])
r0 = np.stack([st[0][2] for st in streams])


def u8(x):
    return np.clip(x, 0, 255).astype(np.uint8)


rest = list(range(1, N))
n_chunks = len(rest) // CH
chunks = []
for c0 in range(0, n_chunks * CH, CH):
    ts = rest[c0 : c0 + CH]
    lefts = np.stack([np.stack([u8(st[t][1]) for st in streams]) for t in ts])
    rights = np.stack([np.stack([u8(st[t][2]) for st in streams]) for t in ts])
    chunks.append((jax.device_put(lefts), jax.device_put(rights)))
jax.block_until_ready(chunks)
log(f"{n_chunks} chunks staged on device")

bvo = BatchedStereoVO(cfg, camera, S, chunk=CH, kf_cadence=args.cadence)
bvo.start(l0, r0)
jax.block_until_ready(bvo.state.pose)
log("bootstrap compiled")
bvo.process_chunk(*chunks[0])
jax.block_until_ready(bvo.state.pose)
log("chunk step compiled")

bvo.start(l0, r0)
jax.block_until_ready(bvo.state.pose)
t0 = time.perf_counter()
for c in chunks:
    bvo.process_chunk(*c)
jax.block_until_ready(bvo.state.pose)
dt = time.perf_counter() - t0
n_stepped = n_chunks * CH
agg = S * n_stepped / dt
log(f"timed: {dt*1e3:.1f} ms for {n_chunks}x{CH} frames x {S} streams")

trajs = bvo.trajectories(n_stepped + 1)
ate0 = ate_rmse(trajs[0], gt[: n_stepped + 1])
ate1 = ate_rmse(trajs[1], gt[: n_stepped + 1][::-1]) if S > 1 else float("nan")
print(
    f"aggregate {agg:8.1f} frames/s | per-chunk {dt/n_chunks*1e3:7.2f} ms | "
    f"S={S} chunk={CH} cadence={args.cadence} | "
    f"ate_fwd {ate0:.4f} m ate_rev {ate1:.4f} m"
)
