"""Camera, triangulation, and PnP tests against independent oracles
(cv2 / closed-form), per SURVEY.md §4."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from svo_tpu.config import RansacParams
from svo_tpu.geometry import camera, pnp, se3, triangulate

FX, FY, CX, CY, BASE = 718.856, 718.856, 607.1928, 185.2157, 0.5372


def make_cam():
    return camera.from_intrinsics(FX, FY, CX, CY, BASE)


def make_scene(rng, n=128, noise=0.0):
    """Random 3D points in front of the camera + stereo projections."""
    X = np.stack(
        [
            rng.uniform(-10, 10, n),
            rng.uniform(-3, 3, n),
            rng.uniform(4, 40, n),
        ],
        axis=-1,
    ).astype(np.float32)
    cam = make_cam()
    uv_l = np.asarray(camera.project_P(cam.P_left, jnp.asarray(X)))
    uv_r = np.asarray(camera.project_P(cam.P_right, jnp.asarray(X)))
    if noise:
        uv_l = uv_l + rng.normal(0, noise, uv_l.shape).astype(np.float32)
        uv_r = uv_r + rng.normal(0, noise, uv_r.shape).astype(np.float32)
    return cam, X, uv_l.astype(np.float32), uv_r.astype(np.float32)


def test_projection_roundtrip(rng):
    cam, X, uv_l, _ = make_scene(rng)
    uv2 = np.asarray(camera.project(cam.K, jnp.asarray(X)))
    np.testing.assert_allclose(uv2, uv_l, atol=1e-2)
    Xb = np.asarray(camera.backproject(cam.K, jnp.asarray(uv_l), jnp.asarray(X[:, 2])))
    np.testing.assert_allclose(Xb, X, rtol=1e-3, atol=1e-2)


def test_triangulate_exact(rng):
    cam, X, uv_l, uv_r = make_scene(rng)
    Xt = np.asarray(
        triangulate.triangulate_dlt(cam.P_left, cam.P_right, jnp.asarray(uv_l), jnp.asarray(uv_r))
    )
    np.testing.assert_allclose(Xt, X, rtol=5e-3, atol=5e-2)


def test_triangulate_vs_cv2(rng):
    import cv2

    cam, X, uv_l, uv_r = make_scene(rng, noise=0.3)
    Xt = np.asarray(
        triangulate.triangulate_dlt(cam.P_left, cam.P_right, jnp.asarray(uv_l), jnp.asarray(uv_r))
    )
    Xh = cv2.triangulatePoints(
        np.asarray(cam.P_left), np.asarray(cam.P_right), uv_l.T, uv_r.T
    )
    X_cv = (Xh[:3] / Xh[3]).T
    np.testing.assert_allclose(Xt, X_cv, rtol=2e-2, atol=0.3)


def test_triangulate_rectified_matches_dlt(rng):
    cam, X, uv_l, uv_r = make_scene(rng)
    Xr = np.asarray(
        triangulate.triangulate_rectified(
            cam.fx, cam.baseline, jnp.asarray(uv_l), jnp.asarray(uv_r), cam.K
        )
    )
    np.testing.assert_allclose(Xr, X, rtol=5e-3, atol=5e-2)


def test_kitti_calib_parse(tmp_path):
    calib = tmp_path / "calib.txt"
    P2 = np.arange(12, dtype=np.float32) + 1
    P3 = np.arange(12, dtype=np.float32) + 100
    lines = [
        "P0: " + " ".join(["0"] * 12),
        "P1: " + " ".join(["0"] * 12),
        "P2: " + " ".join(str(x) for x in P2),
        "P3: " + " ".join(str(x) for x in P3),
    ]
    calib.write_text("\n".join(lines))
    cam = camera.parse_kitti_calib(str(calib))
    np.testing.assert_allclose(np.asarray(cam.P_left), P2.reshape(3, 4))
    np.testing.assert_allclose(np.asarray(cam.P_right), P3.reshape(3, 4))


def _pose(rng, angle=0.1, trans=1.0):
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * angle
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Rotation.from_rotvec(w).as_matrix()
    T[:3, 3] = rng.normal(size=3) * trans
    return T


@pytest.mark.parametrize("outlier_frac,noise", [(0.0, 0.0), (0.3, 0.5)])
def test_ransac_pnp(rng, outlier_frac, noise):
    cam, X, _, _ = make_scene(rng, n=256)
    T_wc_true = _pose(rng)  # camera-to-world
    T_cw = np.linalg.inv(T_wc_true)
    Xc = (T_cw[:3, :3] @ X.T).T + T_cw[:3, 3]
    uv = np.asarray(camera.project(cam.K, jnp.asarray(Xc))).astype(np.float32)
    if noise:
        uv += rng.normal(0, noise, uv.shape).astype(np.float32)
    n_out = int(outlier_frac * len(uv))
    if n_out:
        idx = rng.choice(len(uv), n_out, replace=False)
        uv[idx] += rng.uniform(30, 200, (n_out, 2)).astype(np.float32)
    valid = np.ones(len(uv), bool)
    valid[-16:] = False  # exercise masking

    res = pnp.ransac_pnp(
        cam.K,
        jnp.asarray(X),
        jnp.asarray(uv),
        jnp.asarray(valid),
        jax.random.PRNGKey(0),
        RansacParams(),
    )
    assert bool(res.ok)
    T_est = np.asarray(res.T_wc)
    # rotation error (deg) and translation error
    dR = Rotation.from_matrix(T_est[:3, :3] @ T_wc_true[:3, :3].T).magnitude()
    dt = np.linalg.norm(T_est[:3, 3] - T_wc_true[:3, 3])
    assert dR < np.deg2rad(0.5), f"rot err {np.rad2deg(dR)} deg"
    assert dt < 0.05 if noise == 0 else dt < 0.2, f"trans err {dt}"
    if outlier_frac > 0:
        inl = np.asarray(res.inliers)
        assert inl[valid].mean() > 0.6
        assert not inl[~valid].any()


def test_ransac_pnp_vs_cv2(rng):
    """Cross-check against cv2.solvePnPRansac on the same noisy data."""
    import cv2

    cam, X, _, _ = make_scene(rng, n=200)
    T_wc_true = _pose(rng)
    T_cw = np.linalg.inv(T_wc_true)
    Xc = (T_cw[:3, :3] @ X.T).T + T_cw[:3, 3]
    uv = np.asarray(camera.project(cam.K, jnp.asarray(Xc))).astype(np.float32)
    uv += rng.normal(0, 0.5, uv.shape).astype(np.float32)
    valid = np.ones(len(uv), bool)

    res = pnp.ransac_pnp(
        cam.K, jnp.asarray(X), jnp.asarray(uv), jnp.asarray(valid),
        jax.random.PRNGKey(1), RansacParams(),
    )
    okcv, rvec, tvec, _ = cv2.solvePnPRansac(
        X.astype(np.float64), uv.astype(np.float64), np.asarray(cam.K, np.float64),
        np.zeros(4), iterationsCount=100, reprojectionError=8.0, confidence=0.999,
        flags=cv2.SOLVEPNP_SQPNP,
    )
    assert okcv
    R_cv, _ = cv2.Rodrigues(rvec)
    T_cv = np.eye(4)
    T_cv[:3, :3] = R_cv
    T_cv[:3, 3] = tvec[:, 0]
    T_wc_cv = np.linalg.inv(T_cv)
    T_est = np.asarray(res.T_wc)
    dR = Rotation.from_matrix(T_est[:3, :3] @ T_wc_cv[:3, :3].T).magnitude()
    assert dR < np.deg2rad(0.3)
    np.testing.assert_allclose(T_est[:3, 3], T_wc_cv[:3, 3], atol=0.1)


def test_gt_parse(tmp_path):
    from svo_tpu.io import kitti

    T = np.eye(4)
    T[:3, 3] = [1, 2, 3]
    line = " ".join(str(x) for x in T[:3].reshape(-1))
    p = tmp_path / "poses.txt"
    p.write_text(line + "\n" + line + "\n")
    poses = kitti.parse_ground_truth(str(p))
    assert poses.shape == (2, 4, 4)
    np.testing.assert_allclose(poses[0], T)
    assert kitti.parse_ground_truth(str(tmp_path / "missing.txt")).shape == (0, 4, 4)
