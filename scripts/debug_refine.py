"""CPU-scale debug of the multi-stream refine path: why do reversed streams
drift, and does the between-chunk global refinement actually engage?

Small images (184x320) so the full 8-stream x ~100-frame run is tractable on
CPU; the refine/gate logic is backend-independent.

    python scripts/debug_refine.py --frames 97
    python scripts/debug_refine.py --frames 97 --inpipe-ba   # cfg.ba.enabled
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--frames", type=int, default=97)
parser.add_argument("--streams", type=int, default=8)
parser.add_argument("--chunk", type=int, default=12)
parser.add_argument("--cadence", type=int, default=6)
parser.add_argument("--refine-every", type=int, default=2)
parser.add_argument("--inpipe-ba", action="store_true")
parser.add_argument("--max-age", type=int, default=0)
parser.add_argument("--no-refine", action="store_true")
parser.add_argument("--speed", type=float, default=0.3)
args = parser.parse_args()

import jax

jax.config.update("jax_platforms", "cpu")
_ = jax.devices()

import dataclasses

import numpy as np

from svo_tpu.config import BaParams, Config
from svo_tpu.eval.trajectory import ate_rmse
from svo_tpu.geometry import camera as cam_mod
from svo_tpu.io.synthetic import SyntheticSequence
from svo_tpu.parallel.batched import BatchedStereoVO

SHAPE = (184, 320)
t0 = time.perf_counter()


def log(m):
    print(f"[+{time.perf_counter() - t0:6.1f}s] {m}", flush=True)


seq = SyntheticSequence(
    n_frames=args.frames, shape=SHAPE, fx=200.0, speed=args.speed
)
frames = list(seq)
cfg = Config(use_orb=False, image_height=SHAPE[0], image_width=SHAPE[1])
if args.inpipe_ba:
    cfg = dataclasses.replace(cfg, ba=dataclasses.replace(cfg.ba, enabled=True))
if args.max_age:
    cfg = dataclasses.replace(
        cfg, tracking=dataclasses.replace(cfg.tracking, max_track_age=args.max_age)
    )
camera = cam_mod.from_intrinsics(
    seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2], seq.baseline
)

S, CH = args.streams, args.chunk
streams = [frames if s % 2 == 0 else frames[::-1] for s in range(S)]
l0 = np.stack([st[0][1] for st in streams])
r0 = np.stack([st[0][2] for st in streams])


def u8(x):
    return np.clip(x, 0, 255).astype(np.uint8)


rest = list(range(1, args.frames))
n_chunks = len(rest) // CH
chunks = []
for c0 in range(0, n_chunks * CH, CH):
    ts = rest[c0 : c0 + CH]
    chunks.append((
        np.stack([np.stack([u8(st[t][1]) for st in streams]) for t in ts]),
        np.stack([np.stack([u8(st[t][2]) for st in streams]) for t in ts]),
    ))

bvo = BatchedStereoVO(cfg, camera, S, chunk=CH, kf_cadence=args.cadence)
bvo.make_refiner()
bvo.start(l0, r0)
log(f"start: {n_chunks} chunks, inpipe_ba={cfg.ba.enabled}")


def ates(n):
    trajs = bvo.trajectories(n)
    out = []
    for s in range(S):
        gt = seq.gt_poses if s % 2 == 0 else seq.gt_poses[::-1]
        out.append(round(ate_rmse(trajs[s], gt[:n]), 4))
    return out


for i, c in enumerate(chunks):
    bvo.process_chunk(*c)
    n = 1 + (i + 1) * CH
    line = f"chunk {i + 1}/{n_chunks}: ate={ates(n)}"
    if not args.no_refine and (i + 1) % args.refine_every == 0:
        acc = bvo.refine()
        line += f" refine acc={acc.astype(int).tolist()} ate_after={ates(n)}"
    log(line)

n = 1 + n_chunks * CH
log(f"final ate={ates(n)} max={max(ates(n))}")
