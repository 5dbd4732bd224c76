"""Pinhole camera model and KITTI projection matrices.

Replaces the reference's raw 3x4 projection-matrix plumbing
(reference: src/main.cpp:12-35 parseCalib; src/tracking.cpp:29-31 K and
P2/P3 construction) with a typed, batched JAX camera model.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Camera(NamedTuple):
    """Rectified stereo camera rig.

    K: (3,3) intrinsics of the left camera.
    P_left / P_right: (3,4) projection matrices (KITTI P2 / P3) mapping world
    (= left-camera-at-origin) homogeneous points to pixels.
    """

    K: jnp.ndarray
    P_left: jnp.ndarray
    P_right: jnp.ndarray

    @property
    def fx(self):
        return self.K[0, 0]

    @property
    def fy(self):
        return self.K[1, 1]

    @property
    def cx(self):
        return self.K[0, 2]

    @property
    def cy(self):
        return self.K[1, 2]

    @property
    def baseline(self):
        """Stereo baseline in meters: b = -P_right[0,3] / fx for KITTI."""
        return -self.P_right[0, 3] / self.K[0, 0]


def from_projections(P_left, P_right) -> Camera:
    """Build a Camera from two 3x4 projections (KITTI P2, P3)."""
    P_left = jnp.asarray(P_left, jnp.float32).reshape(3, 4)
    P_right = jnp.asarray(P_right, jnp.float32).reshape(3, 4)
    return Camera(K=P_left[:, :3], P_left=P_left, P_right=P_right)


def from_intrinsics(fx, fy, cx, cy, baseline) -> Camera:
    """Build a rectified rig from intrinsics + baseline (meters)."""
    K = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], jnp.float32)
    P_left = jnp.concatenate([K, jnp.zeros((3, 1), jnp.float32)], axis=1)
    t = jnp.array([[-fx * baseline], [0.0], [0.0]], jnp.float32)
    P_right = jnp.concatenate([K, t], axis=1)
    return Camera(K=K, P_left=P_left, P_right=P_right)


def parse_kitti_calib(path: str) -> Camera:
    """Parse a KITTI calib.txt, reading P2 and P3 (the color stereo pair),
    matching the reference's hardcoded behavior (src/main.cpp:12-35)."""
    mats = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if not parts:
                continue
            key = parts[0].rstrip(":")
            vals = np.array([float(x) for x in parts[1:]], dtype=np.float32)
            if vals.size == 12:
                mats[key] = vals.reshape(3, 4)
    if "P2" not in mats or "P3" not in mats:
        raise ValueError(f"calib file {path} missing P2/P3")
    return from_projections(mats["P2"], mats["P3"])


def project(K: jnp.ndarray, X_cam: jnp.ndarray) -> jnp.ndarray:
    """Project camera-frame points (...,3) to pixels (...,2)."""
    z = X_cam[..., 2:3]
    xy = X_cam[..., :2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    return jnp.stack([fx * xy[..., 0] + cx, fy * xy[..., 1] + cy], axis=-1)


def project_P(P: jnp.ndarray, X_world: jnp.ndarray) -> jnp.ndarray:
    """Project world points (...,3) through a 3x4 projection to pixels."""
    Xh = jnp.concatenate([X_world, jnp.ones_like(X_world[..., :1])], axis=-1)
    uvw = Xh @ P.T
    w = uvw[..., 2:3]
    return uvw[..., :2] / jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)


def backproject(K: jnp.ndarray, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Unproject pixels (...,2) at given depth (...) to camera-frame points."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    return jnp.stack([x * depth, y * depth, depth], axis=-1)
