"""Render a synthetic soak sequence once into a disk cache.

Soak-scale runs (2000+ frames at 376x1241) spend most of their wall clock
ray-casting frames, not running the pipeline. This renders the sequence once
into a uint8 memmap pair under /tmp/svo_cache/<key>/ so repeated soak /
experiment runs load frames at disk speed.

Workers: rendering is embarrassingly parallel over frames; with --procs N
the frame range splits across N processes writing disjoint memmap slices.

    python scripts/render_cache.py --frames 2401            # default world
    python scripts/render_cache.py --frames 2401 --procs 2
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np  # noqa: E402

from svo_tpu.io.synthetic import SyntheticSequence  # noqa: E402


def cache_key(frames, shape, fx, speed, seed):
    return f"f{frames}_{shape[0]}x{shape[1]}_fx{fx:g}_sp{speed:g}_s{seed}"


def cache_dir(frames, shape, fx, speed, seed, root="/tmp/svo_cache"):
    return os.path.join(root, cache_key(frames, shape, fx, speed, seed))


def open_cache(frames, shape, fx, speed, seed, root="/tmp/svo_cache"):
    """Return (lefts, rights, gt_poses) memmaps if a complete cache exists,
    else None."""
    d = cache_dir(frames, shape, fx, speed, seed, root)
    meta = os.path.join(d, "meta.json")
    if not os.path.exists(meta):
        return None
    with open(meta) as f:
        m = json.load(f)
    if not m.get("complete"):
        return None
    H, W = shape
    lefts = np.memmap(os.path.join(d, "left.u8"), np.uint8, "r",
                      shape=(frames, H, W))
    rights = np.memmap(os.path.join(d, "right.u8"), np.uint8, "r",
                       shape=(frames, H, W))
    gt = np.load(os.path.join(d, "gt_poses.npy"))
    return lefts, rights, gt


def _render_range(d, frames, shape, fx, speed, seed, lo, hi):
    seq = SyntheticSequence(n_frames=frames, shape=shape, fx=fx,
                           speed=speed, seed=seed)
    H, W = shape
    lefts = np.memmap(os.path.join(d, "left.u8"), np.uint8, "r+",
                      shape=(frames, H, W))
    rights = np.memmap(os.path.join(d, "right.u8"), np.uint8, "r+",
                       shape=(frames, H, W))
    t0 = time.perf_counter()
    for i in range(lo, hi):
        l, r = seq.frame(i)
        lefts[i] = np.clip(l, 0, 255).astype(np.uint8)
        rights[i] = np.clip(r, 0, 255).astype(np.uint8)
        if (i - lo) % 100 == 99:
            dt = time.perf_counter() - t0
            print(f"[render {lo}-{hi}] {i - lo + 1}/{hi - lo} "
                  f"({dt / (i - lo + 1):.2f} s/frame)", file=sys.stderr,
                  flush=True)
    lefts.flush()
    rights.flush()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2401)
    ap.add_argument("--height", type=int, default=376)
    ap.add_argument("--width", type=int, default=1241)
    ap.add_argument("--fx", type=float, default=718.856)
    ap.add_argument("--speed", type=float, default=0.3)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--procs", type=int, default=2)
    args = ap.parse_args()

    shape = (args.height, args.width)
    d = cache_dir(args.frames, shape, args.fx, args.speed, args.seed)
    if open_cache(args.frames, shape, args.fx, args.speed, args.seed):
        print(f"cache already complete: {d}")
        return
    os.makedirs(d, exist_ok=True)
    H, W = shape
    for name in ("left.u8", "right.u8"):
        p = os.path.join(d, name)
        if not os.path.exists(p) or os.path.getsize(p) != args.frames * H * W:
            np.memmap(p, np.uint8, "w+", shape=(args.frames, H, W)).flush()

    seq = SyntheticSequence(n_frames=args.frames, shape=shape, fx=args.fx,
                           speed=args.speed, seed=args.seed)
    np.save(os.path.join(d, "gt_poses.npy"), seq.gt_poses)

    bounds = np.linspace(0, args.frames, args.procs + 1).astype(int)
    if args.procs == 1:
        _render_range(d, args.frames, shape, args.fx, args.speed, args.seed,
                      0, args.frames)
    else:
        import multiprocessing as mp

        ps = []
        for k in range(args.procs):
            p = mp.Process(
                target=_render_range,
                args=(d, args.frames, shape, args.fx, args.speed, args.seed,
                      int(bounds[k]), int(bounds[k + 1])),
            )
            p.start()
            ps.append(p)
        for p in ps:
            p.join()
            if p.exitcode != 0:
                raise RuntimeError(f"render worker failed: {p.exitcode}")

    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump({"complete": True, "frames": args.frames,
                   "shape": list(shape), "fx": args.fx, "speed": args.speed,
                   "seed": args.seed}, f)
    print(f"cache complete: {d}")


if __name__ == "__main__":
    main()
