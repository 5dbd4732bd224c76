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


def replenish_always(s, l, r):
    pyr_l = KltTracker.build_pyramid(l, cfg.temporal_klt.max_level)
    fid = s.frame_id + 1
    feats, mp = frontend._replenish(
        s.features, s.map, l, pyr_l, r, s.pose, fid, camera, cfg
    )
    return s._replace(features=feats, map=mp, frame_id=fid, prev_pyramid=pyr_l)


timed("replenish every frame (no cond)", cfg, replenish_always)


from svo_tpu.ops import detect as detect_mod


def detect_only(s, l, r):
    pos, score, valid = detect_mod.detect(l, s.features.pos, s.features.valid, cfg)
    return s._replace(features=s.features._replace(pos=pos[:256] * 1.0))


timed("detect only (in scan)", cfg, detect_only)


def stereo_only(s, l, r):
    pyr_l = KltTracker.build_pyramid(l, cfg.stereo_klt.max_level)
    pyr_r = KltTracker.build_pyramid(r, cfg.stereo_klt.max_level)
    res = KltTracker.track(pyr_l, pyr_r, s.features.pos, s.features.valid, cfg.stereo_klt)
    return s._replace(features=s.features._replace(pos=res.pos))


timed("stereo pyramids + stereo KLT (in scan)", cfg, stereo_only)


def alloc_merge_only(s, l, r):
    from svo_tpu.geometry.triangulate import triangulate_rectified
    det_pos = s.features.pos
    Xc = triangulate_rectified(camera.fx, camera.baseline, det_pos, det_pos - 5.0, camera.K)
    Xw = se3.transform(s.pose, Xc)
    ids, mp = frontend._alloc_points(s.map, Xw, s.features.valid)
    mp = frontend._record_obs(mp, det_pos, ids, s.features.valid, s.frame_id + 1)
    feats = frontend._merge_features(s.features, det_pos, ids, jnp.ones(256), s.features.valid)
    return s._replace(features=feats, map=mp, frame_id=s.frame_id + 1)


timed("triangulate+alloc+merge (in scan)", cfg, alloc_merge_only)


from svo_tpu.geometry.triangulate import triangulate_rectified
from svo_tpu.ops.klt import KltTracker as KT


def make_replenish_variant(no_detect=False, no_stereo=False, no_alloc=False,
                           no_merge=False):
    def fn(s, l, r):
        pyr_l = KT.build_pyramid(l, cfg.temporal_klt.max_level)
        fid = s.frame_id + 1
        feats, mp = s.features, s.map
        if no_detect:
            det_pos, det_score, det_valid = feats.pos, jnp.ones(256), feats.valid
        else:
            det_pos, det_score, det_valid = detect_mod.detect(l, feats.pos, feats.valid, cfg)
        if no_stereo:
            rpos, rstat = det_pos - 5.0, det_valid
        else:
            pyr_r = KT.build_pyramid(r, cfg.stereo_klt.max_level)
            sres = KT.track(pyr_l, pyr_r, det_pos, det_valid, cfg.stereo_klt)
            rpos, rstat = sres.pos, sres.status
        y_ok = jnp.abs(rpos[:, 1] - det_pos[:, 1]) < cfg.tracking.y_threshold
        s_valid = det_valid & rstat & y_ok
        Xc = triangulate_rectified(camera.fx, camera.baseline, det_pos, rpos, camera.K)
        new_valid = s_valid & (Xc[:, 2] > 0)
        Xw = se3.transform(s.pose, Xc)
        if not no_alloc:
            ids, mp = frontend._alloc_points(mp, Xw, new_valid)
            new_valid = new_valid & (ids >= 0)
            u_right = jnp.where(rstat, rpos[:, 0], -1.0)
            mp = frontend._record_obs(mp, det_pos, ids, new_valid, fid, u_right=u_right)
        else:
            ids = jnp.zeros(256, jnp.int32)
        if not no_merge:
            feats = frontend._merge_features(feats, det_pos, ids, det_score, new_valid)
        return s._replace(features=feats, map=mp, frame_id=fid, prev_pyramid=pyr_l)
    return fn


timed("replenish full (variant harness)", cfg, make_replenish_variant())
timed("replenish w/o detect", cfg, make_replenish_variant(no_detect=True))
timed("replenish w/o stereo KLT", cfg, make_replenish_variant(no_stereo=True))
timed("replenish w/o alloc/record", cfg, make_replenish_variant(no_alloc=True))
timed("replenish w/o merge", cfg, make_replenish_variant(no_merge=True))
