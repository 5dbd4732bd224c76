"""Bundle adjustment solver tests: synthetic window problems with known
ground truth (SURVEY.md §4: unit-test Schur reduction against oracles)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from svo_tpu.ba.solver import BAProblem, solve_ba

FX, FY, CX, CY = 500.0, 500.0, 320.0, 240.0
BASELINE = 0.5
K_MAT = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)


def make_problem(rng, n_cams=5, n_pts=120, noise_px=0.5, perturb=True,
                 stereo=True, drop_frac=0.0):
    # cameras along +z, looking forward
    T_wc = np.tile(np.eye(4, dtype=np.float64), (n_cams, 1, 1))
    for i in range(n_cams):
        T_wc[i, :3, 3] = [0.1 * i, 0.02 * i, 0.6 * i]
        T_wc[i, :3, :3] = Rotation.from_euler(
            "yxz", [0.02 * i, 0.01 * i, 0.0]
        ).as_matrix()
    T_cw_true = np.linalg.inv(T_wc)

    pts_true = np.stack(
        [
            rng.uniform(-8, 8, n_pts),
            rng.uniform(-3, 3, n_pts),
            rng.uniform(8, 30, n_pts),
        ],
        axis=-1,
    )

    obs_cam, obs_pnt, obs_uv = [], [], []
    for c in range(n_cams):
        Xc = (T_cw_true[c, :3, :3] @ pts_true.T).T + T_cw_true[c, :3, 3]
        u = FX * Xc[:, 0] / Xc[:, 2] + CX
        v = FY * Xc[:, 1] / Xc[:, 2] + CY
        ur = u - FX * BASELINE / Xc[:, 2]
        vis = (Xc[:, 2] > 1) & (u > 0) & (u < 640) & (v > 0) & (v < 480)
        for p in np.nonzero(vis)[0]:
            if rng.uniform() < drop_frac:
                continue
            un = u[p] + rng.normal(0, noise_px)
            vn = v[p] + rng.normal(0, noise_px)
            urn = ur[p] + rng.normal(0, noise_px) if stereo and rng.uniform() < 0.5 else -1.0
            obs_cam.append(c)
            obs_pnt.append(p)
            obs_uv.append([un, vn, urn])

    O = len(obs_cam)
    O_pad = 1 << int(np.ceil(np.log2(O + 1)))
    pad = O_pad - O

    T_cw_init = T_cw_true.copy()
    pts_init = pts_true.copy()
    if perturb:
        for i in range(1, n_cams):
            dR = Rotation.from_rotvec(rng.normal(0, 0.01, 3)).as_matrix()
            T_cw_init[i, :3, :3] = dR @ T_cw_init[i, :3, :3]
            T_cw_init[i, :3, 3] += rng.normal(0, 0.05, 3)
        pts_init = pts_true + rng.normal(0, 0.1, pts_true.shape)

    problem = BAProblem(
        T_cw=jnp.asarray(T_cw_init, jnp.float32),
        cam_valid=jnp.ones(n_cams, bool),
        points=jnp.asarray(pts_init, jnp.float32),
        pnt_valid=jnp.ones(n_pts, bool),
        obs_cam=jnp.asarray(np.pad(obs_cam, (0, pad)), jnp.int32),
        obs_pnt=jnp.asarray(np.pad(obs_pnt, (0, pad)), jnp.int32),
        obs_uv=jnp.asarray(
            np.pad(np.asarray(obs_uv, np.float32), ((0, pad), (0, 0))), jnp.float32
        ),
        obs_valid=jnp.asarray(np.arange(O_pad) < O),
    )
    return problem, T_cw_true, pts_true


def cam_errors(T_cw_est, T_cw_true):
    T_est = np.asarray(T_cw_est, np.float64)
    rot, trans = [], []
    for a, b in zip(T_est, T_cw_true):
        dR = Rotation.from_matrix(a[:3, :3] @ b[:3, :3].T).magnitude()
        rot.append(dR)
        trans.append(np.linalg.norm(np.linalg.inv(a)[:3, 3] - np.linalg.inv(b)[:3, 3]))
    return np.array(rot), np.array(trans)


def test_ba_converges_from_perturbation(rng):
    """Noise-free measurements: perturbed cameras AND points must snap back
    to exact ground truth (gauge fixed by camera 0 + stereo rows)."""
    problem, T_true, pts_true = make_problem(rng, noise_px=0.0)
    res = solve_ba(
        problem, jnp.asarray(K_MAT), jnp.float32(FX * BASELINE), iterations=15
    )
    assert float(res.cost) < float(res.cost0) * 1e-3
    rot, trans = cam_errors(res.T_cw, T_true)
    assert rot.max() < np.deg2rad(0.05), f"rot err {np.rad2deg(rot.max()):.3f} deg"
    assert trans.max() < 0.005, f"trans err {trans.max():.4f} m"
    # points recovered (only points with >=2 observations are constrained;
    # with drop_frac=0 all visible points have n_cams observations)
    d = np.linalg.norm(np.asarray(res.points) - pts_true, axis=-1)
    assert np.median(d) < 0.02, f"median point err {np.median(d):.3f} m"


def test_ba_noise_floor(rng):
    """With noisy measurements, BA should reach a cost near the noise floor
    and not diverge from ground truth."""
    problem, T_true, pts_true = make_problem(rng, noise_px=1.0)
    res = solve_ba(
        problem, jnp.asarray(K_MAT), jnp.float32(FX * BASELINE), iterations=20
    )
    rot, trans = cam_errors(res.T_cw, T_true)
    assert trans.max() < 0.05
    assert np.isfinite(float(res.cost))


def test_ba_fixed_camera_unchanged(rng):
    problem, T_true, _ = make_problem(rng)
    res = solve_ba(
        problem, jnp.asarray(K_MAT), jnp.float32(FX * BASELINE), iterations=5,
        n_fixed=2,
    )
    np.testing.assert_allclose(
        np.asarray(res.T_cw[:2]), np.asarray(problem.T_cw[:2]), atol=0
    )


def test_ba_masked_obs_ignored(rng):
    """Invalidated observations (mask False) must not affect the solution."""
    problem, T_true, pts_true = make_problem(rng, perturb=True)
    # corrupt padding rows wildly; they are masked out
    uv = np.asarray(problem.obs_uv).copy()
    mask = ~np.asarray(problem.obs_valid)
    uv[mask] = 1e5
    problem2 = problem._replace(obs_uv=jnp.asarray(uv))
    res = solve_ba(problem2, jnp.asarray(K_MAT), jnp.float32(FX * BASELINE), iterations=10)
    rot, trans = cam_errors(res.T_cw, T_true)
    assert trans.max() < 0.03


def test_ba_huber_robust_to_outliers(rng):
    problem, T_true, _ = make_problem(rng, noise_px=0.3)
    uv = np.asarray(problem.obs_uv).copy()
    valid = np.asarray(problem.obs_valid)
    n_out = int(0.1 * valid.sum())
    idx = rng.choice(np.nonzero(valid)[0], n_out, replace=False)
    uv[idx, :2] += rng.uniform(40, 120, (n_out, 2))
    problem2 = problem._replace(obs_uv=jnp.asarray(uv))
    res = solve_ba(problem2, jnp.asarray(K_MAT), jnp.float32(FX * BASELINE), iterations=20)
    rot, trans = cam_errors(res.T_cw, T_true)
    assert trans.max() < 0.08, f"outliers broke BA: {trans.max():.3f} m"
