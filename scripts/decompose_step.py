"""Decompose the per-frame step cost on the current backend.

Runs the real pipeline a few frames on a cached synthetic sequence to get a
REALISTIC state (live features, populated map), then times each stage of
frontend.step_body in isolation with that state, plus the composed step.
Locates where the full-step milliseconds actually go (microbench.py feeds
random noise, which makes KLT early-exit and hides the real cost).
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
_ = jax.devices()

import jax.numpy as jnp
import numpy as np

from svo_tpu.config import Config
from svo_tpu.geometry import camera as cam_mod, se3
from svo_tpu.geometry.pnp import ransac_pnp
from svo_tpu.ops import detect as detect_mod
from svo_tpu.ops.klt import KltTracker
from svo_tpu.pipeline import frontend
from svo_tpu.pipeline.odometry import StereoVO

N = 24
SHAPE = (376, 1241)
CACHE = f"/tmp/synth_cache_{N}_{SHAPE[0]}x{SHAPE[1]}.npz"


def load_frames():
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        frames = [(i, z[f"l{i}"], z[f"r{i}"]) for i in range(N)]
        return frames, z["baseline"], z["K"]
    from svo_tpu.io.synthetic import SyntheticSequence

    seq = SyntheticSequence(n_frames=N, shape=SHAPE, fx=718.856)
    frames = list(seq)
    data = {f"l{i}": l for i, l, _ in frames}
    data.update({f"r{i}": r for i, _, r in frames})
    np.savez(CACHE, gt=seq.gt_poses, baseline=seq.baseline, K=seq.K, **data)
    return frames, seq.baseline, seq.K


frames, baseline, K = load_frames()
cfg = Config(use_orb=False, image_height=SHAPE[0], image_width=SHAPE[1])
camera = cam_mod.from_intrinsics(K[0, 0], K[1, 1], K[0, 2], K[1, 2], float(baseline))

vo = StereoVO(cfg, camera)
it = iter(frames)
_, l0, r0 = next(it)
vo.start(l0, r0)
for _, l, r in it:
    vo.process(l, r)
state = vo.state
jax.block_until_ready(state.pose)
print(f"state ready: {int(state.features.count())} live features, "
      f"{int(state.map.n_points)} map points", file=sys.stderr)

_, lN, rN = frames[-1]
left = jnp.asarray(lN, jnp.float32)
right = jnp.asarray(rN, jnp.float32)


def bench(name, fn, *a, reps=20):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:44s} {dt:8.3f} ms")
    return dt


pyr_f = jax.jit(lambda im: KltTracker.build_pyramid(im, cfg.temporal_klt.max_level))
pyr_prev = state.prev_pyramid
pyr_curr = pyr_f(left)

bench("pyramid build (4 levels + grads)", pyr_f, left)

klt_t = jax.jit(
    lambda a, b, p, v: KltTracker.track(a, b, p, v, cfg.temporal_klt)
)
bench("temporal KLT (realistic tracks)", klt_t, pyr_prev, pyr_curr,
      state.features.pos, state.features.valid)

tres = klt_t(pyr_prev, pyr_curr, state.features.pos, state.features.valid)
fb_params = dataclasses.replace(cfg.temporal_klt, max_level=0, max_iters=10)
klt_fb = jax.jit(
    lambda a, b, p, v, fl: KltTracker.track(a, b, p, v, fb_params, init_flow=fl)
)
bench("fb-check KLT (level 0, 10 it)", klt_fb, pyr_curr, pyr_prev, tres.pos,
      tres.status, state.features.pos - tres.pos)

Xw = state.map.points[jnp.clip(state.features.point_id, 0)]
pnp_f = jax.jit(
    lambda x, u, v, k, Ti: ransac_pnp(camera.K, x, u, v, k, cfg.ransac, T_init=Ti)
)
bench("RANSAC-PnP (realistic)", pnp_f, Xw, tres.pos,
      state.features.valid & tres.status, state.rng, se3.inverse(state.pose))

det_f = jax.jit(lambda im, p, v: detect_mod.detect(im, p, v, cfg))
bench("detect (FAST+NMS+bucket)", det_f, left, state.features.pos,
      state.features.valid)

pyr_s = jax.jit(lambda im: KltTracker.build_pyramid(im, cfg.stereo_klt.max_level))
pyr_r = pyr_s(right)
klt_s = jax.jit(lambda a, b, p, v: KltTracker.track(a, b, p, v, cfg.stereo_klt))
det_pos, det_score, det_valid = det_f(left, state.features.pos, state.features.valid)
bench("stereo KLT (on detections)", klt_s, pyr_curr, pyr_r, det_pos, det_valid)

step = jax.jit(lambda s, l, r: frontend.step_body(s, l, r, camera, cfg))
bench("FULL STEP non-KF (realistic state)", step, state, left, right, reps=10)

# force the KF branch by zeroing feature validity (count < features_to_track)
state_kf = state._replace(
    features=state.features._replace(
        valid=state.features.valid & (jnp.arange(cfg.capacity.max_features) < 40)
    ),
    prev_is_kf=jnp.zeros((), bool),
)
bench("FULL STEP KF path (replenish)", step, state_kf, left, right, reps=10)
