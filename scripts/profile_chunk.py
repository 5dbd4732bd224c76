"""Trace one batched cadenced chunk on the current backend and print the
per-op time breakdown (where the milliseconds of a lockstep frame-step go).

Uses the persistent compilation cache so repeated invocations skip the
multi-minute remote compile.

    python scripts/profile_chunk.py --streams 8 --chunk 12 --cadence 6
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--streams", type=int, default=8)
parser.add_argument("--chunk", type=int, default=12)
parser.add_argument("--cadence", type=int, default=6)
parser.add_argument("--frames", type=int, default=49)
parser.add_argument("--top", type=int, default=40)
args = parser.parse_args()

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if args.cpu:
    jax.config.update("jax_platforms", "cpu")
_ = jax.devices()

import numpy as np

from svo_tpu.config import Config
from svo_tpu.geometry import camera as cam_mod
from svo_tpu.parallel.batched import BatchedStereoVO

N = args.frames
SHAPE = (376, 1241)
CACHE = f"/tmp/synth_cache_{N}_{SHAPE[0]}x{SHAPE[1]}.npz"
T0 = time.perf_counter()


def log(m):
    print(f"[+{time.perf_counter() - T0:6.1f}s] {m}", file=sys.stderr, flush=True)


if os.path.exists(CACHE):
    z = np.load(CACHE)
    frames = [(i, z[f"l{i}"], z[f"r{i}"]) for i in range(N)]
    baseline, K = float(z["baseline"]), z["K"]
else:
    from svo_tpu.io.synthetic import SyntheticSequence

    seq = SyntheticSequence(n_frames=N, shape=SHAPE, fx=718.856)
    frames = list(seq)
    data = {f"l{i}": l for i, l, _ in frames}
    data.update({f"r{i}": r for i, _, r in frames})
    np.savez(CACHE, gt=seq.gt_poses, baseline=seq.baseline, K=seq.K, **data)
    baseline, K = float(seq.baseline), seq.K
log(f"{N} frames ready")

cfg = Config(use_orb=False, image_height=SHAPE[0], image_width=SHAPE[1])
camera = cam_mod.from_intrinsics(K[0, 0], K[1, 1], K[0, 2], K[1, 2], baseline)
S, CH = args.streams, args.chunk

streams = [frames if s % 2 == 0 else frames[::-1] for s in range(S)]
l0 = np.stack([st[0][1] for st in streams])
r0 = np.stack([st[0][2] for st in streams])


def u8(x):
    return np.clip(x, 0, 255).astype(np.uint8)


ts = list(range(1, 1 + CH))
lefts = jax.device_put(
    np.stack([np.stack([u8(st[t][1]) for st in streams]) for t in ts])
)
rights = jax.device_put(
    np.stack([np.stack([u8(st[t][2]) for st in streams]) for t in ts])
)
jax.block_until_ready((lefts, rights))

bvo = BatchedStereoVO(cfg, camera, S, chunk=CH, kf_cadence=args.cadence)
bvo.start(l0, r0)
jax.block_until_ready(bvo.state.pose)
log("bootstrap ready")
bvo.process_chunk(lefts, rights)
jax.block_until_ready(bvo.state.pose)
log("chunk step ready (compiled or cache hit)")

t0 = time.perf_counter()
bvo.process_chunk(lefts, rights)
jax.block_until_ready(bvo.state.pose)
warm_ms = (time.perf_counter() - t0) * 1e3
log(f"warm chunk: {warm_ms:.1f} ms ({warm_ms / CH:.1f} ms per {S}-stream step)")

trace_dir = "/tmp/svo_trace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    bvo.process_chunk(lefts, rights)
    jax.block_until_ready(bvo.state.pose)
log("trace captured")

# ---- parse the raw trace-viewer JSON (tensorboard_plugin_profile is broken
# in this environment: protobuf/pywrap mismatch): aggregate device time per
# op name and per op-type prefix on the TPU lane ----
traces = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
if not traces:
    log("no trace.json.gz found; raw dir listing:")
    os.system(f"find {trace_dir} | head -20")
    sys.exit(1)

import collections

with gzip.open(traces[0]) as f:
    tr = json.load(f)
ev = [e for e in tr["traceEvents"] if e.get("ph") == "X"]
pids = {
    e["pid"]: e["args"].get("name", "")
    for e in tr["traceEvents"]
    if e.get("ph") == "M" and e.get("name") == "process_name"
}
tpu_pids = [p for p, n in pids.items() if "TPU" in n]
dev = [e for e in ev if e["pid"] in tpu_pids]
lanes = collections.Counter(e["tid"] for e in dev)
work = [e for e in dev if lanes[e["tid"]] == max(lanes.values())]

by_name = collections.Counter()
by_kind = collections.Counter()
cnt = collections.Counter()
for e in work:
    by_name[e["name"]] += e["dur"]
    kind = e["name"].split(".")[0]
    by_kind[kind] += e["dur"]
    cnt[kind] += 1
total = sum(e["dur"] for e in work)
print(f"\ndevice lane events: {len(work)}, total (incl. nesting) "
      f"{total / 1e3:.1f} ms")
print("-- by op kind --")
for n, d in by_kind.most_common(18):
    print(f"  {d / 1e3:9.2f} ms x{cnt[n]:6d}  {n}")
print("-- top individual ops --")
for n, d in by_name.most_common(args.top):
    print(f"  {d / 1e3:9.2f} ms  {n[:90]}")
