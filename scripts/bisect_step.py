"""Ablation bisect of the chunked per-frame step cost on the current backend:
times chunked scan variants with stages knocked out to attribute the frame
budget."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
_ = jax.devices()

import dataclasses
from functools import partial

import jax.numpy as jnp
import numpy as np

from svo_tpu.config import Config, TrackingParams
from svo_tpu.geometry import camera as cam_mod, se3
from svo_tpu.geometry.pnp import ransac_pnp
from svo_tpu.ops.klt import KltTracker
from svo_tpu.pipeline import frontend
from svo_tpu.pipeline.state import FeatureSet, VoState
import __graft_entry__ as ge

H, W, K = 376, 1241, 16
camera = cam_mod.from_intrinsics(718.0, 718.0, W / 2, H / 2, 0.54)
rng = np.random.default_rng(0)
lefts = jnp.asarray(rng.integers(0, 255, (K, H, W)).astype(np.uint8))
rights = jnp.asarray(rng.integers(0, 255, (K, H, W)).astype(np.uint8))


def timed(name, cfg, body):
    @partial(jax.jit, donate_argnums=(0,))
    def chunk(state, ls, rs):
        def f(st, lr):
            l, r = lr
            return body(st, l.astype(jnp.float32), r.astype(jnp.float32)), None

        state, _ = jax.lax.scan(f, state, (ls, rs))
        return state

    state = ge._example_state(cfg, camera)
    state = chunk(state, lefts, rights)
    jax.block_until_ready(state.pose)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        state = chunk(state, lefts, rights)
    jax.block_until_ready(state.pose)
    ms = (time.perf_counter() - t0) / reps / K * 1e3
    print(f"{name:44s} {ms:8.2f} ms/frame", flush=True)


cfg = Config(use_orb=False, image_height=H, image_width=W)

# full step (KF policy can fire)
timed("full step", cfg, lambda s, l, r: frontend.step_body(s, l, r, camera, cfg))

# KF replenishment impossible (features_to_track=0 -> is_kf always False)
cfg_nokf = dataclasses.replace(cfg, tracking=TrackingParams(features_to_track=0))
timed("step, KF branch never taken", cfg_nokf,
      lambda s, l, r: frontend.step_body(s, l, r, camera, cfg_nokf))


# stages in isolation inside the same scan harness
def track_only(s, l, r):
    pyr = KltTracker.build_pyramid(l, cfg.temporal_klt.max_level)
    res = KltTracker.track(s.prev_pyramid, pyr, s.features.pos, s.features.valid,
                           cfg.temporal_klt)
    return s._replace(prev_pyramid=pyr,
                      features=s.features._replace(pos=res.pos))


timed("pyramid + temporal KLT only", cfg, track_only)


def pnp_only(s, l, r):
    Xw = s.map.points[jnp.clip(s.features.point_id, 0)]
    rng_, sub = jax.random.split(s.rng)
    pres = ransac_pnp(camera.K, Xw, s.features.pos, s.features.valid, sub,
                      cfg.ransac, T_init=se3.inverse(s.pose))
    return s._replace(rng=rng_, pose=jnp.where(pres.ok, pres.T_wc, s.pose))


timed("RANSAC-PnP only", cfg, pnp_only)


def obs_only(s, l, r):
    mp = frontend._record_obs(s.map, s.features.pos, s.features.point_id,
                              s.features.valid, s.frame_id + 1)
    return s._replace(map=mp, frame_id=s.frame_id + 1)


timed("record_obs only", cfg, obs_only)


def bookkeeping_only(s, l, r):
    fid = s.frame_id + 1
    return s._replace(
        frame_id=fid,
        poses=s.poses.at[fid].set(s.pose),
        kf_flags=s.kf_flags.at[fid].set(True),
        metrics=s.metrics.at[fid].set(jnp.zeros(5)),
    )


timed("trajectory bookkeeping only", cfg, bookkeeping_only)
