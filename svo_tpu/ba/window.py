"""Sliding-window problem extraction from the live map state, and write-back.

Builds a fixed-shape BAProblem from the device-resident observation ring
(MapState.obs_*) for the frame window [frame_hi - K + 1, frame_hi]:

- observation rows are selected by frame id (the ring's overwrite semantics
  make old rows drop out naturally),
- global point ids are remapped to dense window slots with a sort +
  first-occurrence cumsum (a TPU-friendly 'unique'),
- after solve_ba, updated points scatter back into the global map and updated
  poses into the trajectory.

Everything is jittable with static capacities; all variable counts are masks
(SURVEY.md §7 design stance).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from svo_tpu.ba.solver import BAProblem
from svo_tpu.geometry import se3
from svo_tpu.pipeline.state import MapState

_BIG = jnp.int32(2**30)


class WindowMapping(NamedTuple):
    slot_to_pid: jnp.ndarray   # (P,) global point id per window slot (-1 empty)
    frame_lo: jnp.ndarray      # first frame id in the window


@partial(jax.jit, static_argnames=("n_cams", "n_points", "n_obs"))
def extract_window(
    mp: MapState,
    poses_wc: jnp.ndarray,
    frame_hi: jnp.ndarray,
    n_cams: int,
    n_points: int,
    n_obs: int,
) -> tuple[BAProblem, WindowMapping]:
    """Build the BA problem for the window ending at frame_hi (inclusive)."""
    frame_lo = jnp.maximum(frame_hi - (n_cams - 1), 0)
    sel = (mp.obs_fid >= frame_lo) & (mp.obs_fid <= frame_hi) & (mp.obs_pid >= 0)

    # --- compact selected rows into n_obs slots ---
    sel_i = sel.astype(jnp.int32)
    rank = jnp.cumsum(sel_i) - sel_i
    row_slot = jnp.where(sel & (rank < n_obs), rank, n_obs)  # n_obs -> dropped

    O = n_obs
    obs_fid = jnp.full((O,), -1, jnp.int32).at[row_slot].set(mp.obs_fid, mode="drop")
    obs_pid_g = jnp.full((O,), -1, jnp.int32).at[row_slot].set(mp.obs_pid, mode="drop")
    obs_uv = jnp.zeros((O, 3), jnp.float32).at[row_slot].set(mp.obs_uv, mode="drop")
    obs_ok = obs_fid >= 0

    # --- remap global pids to dense window slots (sorted first-occurrence) ---
    pids_for_sort = jnp.where(obs_ok, obs_pid_g, _BIG)
    order = jnp.argsort(pids_for_sort)
    sorted_pids = pids_for_sort[order]
    prev = jnp.concatenate([jnp.full((1,), -2, jnp.int32), sorted_pids[:-1]])
    first = (sorted_pids != prev) & (sorted_pids < _BIG)
    slot_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1  # slot of each sorted row
    slot_sorted = jnp.where(sorted_pids < _BIG, slot_sorted, n_points)

    # scatter back to original observation order
    obs_pnt = jnp.zeros((O,), jnp.int32).at[order].set(
        jnp.minimum(slot_sorted, n_points).astype(jnp.int32)
    )
    obs_ok = obs_ok & (obs_pnt < n_points)

    # window slot -> global pid table
    slot_to_pid = jnp.full((n_points,), -1, jnp.int32).at[
        jnp.where(first, slot_sorted, n_points)
    ].set(sorted_pids, mode="drop")

    # --- gather window points and cameras ---
    # A point needs >=2 observations in the window (or one stereo row, which
    # constrains depth by itself) to be well-posed; under-constrained points
    # would absorb damped-but-arbitrary updates and corrupt the global map on
    # write-back.
    obs_per_slot = jnp.zeros((n_points + 1,), jnp.int32).at[
        jnp.minimum(obs_pnt, n_points)
    ].add(obs_ok.astype(jnp.int32))[:n_points]
    stereo_per_slot = jnp.zeros((n_points + 1,), jnp.int32).at[
        jnp.minimum(obs_pnt, n_points)
    ].add((obs_ok & (obs_uv[:, 2] >= 0)).astype(jnp.int32))[:n_points]
    constrained = (obs_per_slot >= 2) | (stereo_per_slot >= 1)
    pnt_valid = (slot_to_pid >= 0) & constrained
    points = mp.points[jnp.clip(slot_to_pid, 0)] * pnt_valid[:, None]

    cam_ids = frame_lo + jnp.arange(n_cams)
    T_wc = poses_wc[jnp.clip(cam_ids, 0, poses_wc.shape[0] - 1)]
    T_cw = se3.inverse(T_wc)
    cam_valid = cam_ids <= frame_hi

    problem = BAProblem(
        T_cw=T_cw,
        cam_valid=cam_valid,
        points=points,
        pnt_valid=pnt_valid,
        obs_cam=jnp.clip(obs_fid - frame_lo, 0, n_cams - 1),
        obs_pnt=jnp.clip(obs_pnt, 0, n_points - 1),
        obs_uv=obs_uv,
        obs_valid=obs_ok,
    )
    return problem, WindowMapping(slot_to_pid=slot_to_pid, frame_lo=frame_lo)


@jax.jit
def write_back(
    mp: MapState,
    poses_wc: jnp.ndarray,
    mapping: WindowMapping,
    T_cw_opt: jnp.ndarray,
    points_opt: jnp.ndarray,
    pnt_valid: jnp.ndarray,
    cam_valid: jnp.ndarray,
) -> tuple[MapState, jnp.ndarray]:
    """Scatter optimized points into the global map and optimized poses into
    the trajectory. Returns (new MapState, new poses array)."""
    M = mp.points.shape[0]
    pid = jnp.where(pnt_valid & (mapping.slot_to_pid >= 0), mapping.slot_to_pid, M)
    points = mp.points.at[pid].set(points_opt, mode="drop")

    n_cams = T_cw_opt.shape[0]
    cam_ids = mapping.frame_lo + jnp.arange(n_cams)
    fidx = jnp.where(cam_valid, cam_ids, poses_wc.shape[0])
    T_wc_opt = se3.inverse(T_cw_opt)
    poses = poses_wc.at[fidx].set(T_wc_opt, mode="drop")
    return mp._replace(points=points), poses
