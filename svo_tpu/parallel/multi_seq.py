"""Data-parallel multi-sequence VO: one independent VO stream per device.

The VO frame loop is latency-bound (SURVEY.md §7 hard-part #4); the
throughput-parallel escape valve is running many sequences at once — e.g.
the full KITTI 00-10 evaluation as 11 streams over a pod slice. Each device
owns one stream's complete state (features, map, observation ring); a psum
across the mesh aggregates fleet health metrics (per-step tracked-feature /
inlier-ratio / map-size totals, exposed as `fleet_health` after each
`process` call). No cross-stream data is exchanged, so scaling is
embarrassingly parallel and the collective is one small vector per step.

All streams share one static Config (shapes) and one camera; KITTI's
per-sequence calibrations differ slightly — resample to a common intrinsic
or batch the camera if exactness per-stream matters.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from svo_tpu.config import Config
from svo_tpu.geometry.camera import Camera
from svo_tpu.pipeline import frontend

AXIS = "stream"


class MultiStereoVO:
    def __init__(self, cfg: Config, camera: Camera, n_streams: int,
                 devices=None):
        self.cfg = cfg
        self.camera = camera
        self.n = n_streams
        devs = devices if devices is not None else jax.devices()[:n_streams]
        assert len(devs) >= 1
        self.mesh = Mesh(np.array(devs[:n_streams]), axis_names=(AXIS,))
        self.state = None
        # jitted batched bootstrap + sharded step
        boot = frontend.make_bootstrap(camera, cfg)

        @jax.jit
        def boot_batched(lefts, rights, seeds):
            return jax.vmap(lambda l, r, s: boot(l, r, s))(lefts, rights, seeds)

        self._boot = boot_batched

        def per_device(st, l, r):
            st = jax.tree.map(lambda x: x[0], st)
            new = frontend.step_body(
                st, l[0].astype(jnp.float32), r[0].astype(jnp.float32),
                camera, cfg,
            )
            # fleet health: sum this step's metrics row over the mesh — one
            # small psum per step ([n_tracked, inlier_ratio, n_features,
            # is_kf, n_map_points] summed across streams; divide by S on the
            # host for means).
            health = jax.lax.psum(new.metrics[new.frame_id], AXIS)
            return jax.tree.map(lambda x: x[None], new), health

        self._per_device = per_device
        self.fleet_health: np.ndarray | None = None

    def _sharding(self, tree):
        return jax.tree.map(lambda _: NamedSharding(self.mesh, P(AXIS)), tree)

    def start(self, lefts: np.ndarray, rights: np.ndarray, seed: int = 0):
        """lefts/rights: (S, H, W) first frames of each stream."""
        seeds = jnp.arange(self.n, dtype=jnp.uint32) + seed
        state = self._boot(
            jnp.asarray(lefts, jnp.float32), jnp.asarray(rights, jnp.float32), seeds
        )
        self.state = jax.device_put(state, self._sharding(state))
        spec = jax.tree.map(lambda _: P(AXIS), state)

        step = jax.shard_map(
            self._per_device,
            mesh=self.mesh,
            in_specs=(spec, P(AXIS), P(AXIS)),
            out_specs=(spec, P()),
            check_vma=False,
        )
        self._step = jax.jit(step, donate_argnums=(0,))
        self._img_sharding = NamedSharding(self.mesh, P(AXIS))

    def process(self, lefts: np.ndarray, rights: np.ndarray):
        """(S, H, W) uint8/float frames, one per stream. Updates
        `fleet_health` with the psum-aggregated metrics row (summed over
        streams: [n_tracked, inlier_ratio, n_features, is_kf, n_map_points])."""
        l = jax.device_put(np.asarray(lefts), self._img_sharding)
        r = jax.device_put(np.asarray(rights), self._img_sharding)
        self.state, self.fleet_health = self._step(self.state, l, r)

    def trajectories(self, n_frames: int) -> np.ndarray:
        """(S, n_frames, 4, 4) camera-to-world trajectories."""
        return np.asarray(self.state.poses[:, :n_frames])
