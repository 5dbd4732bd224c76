"""Block-partitioned BA + pose-graph consensus on live pipeline state
(SURVEY.md §2.3 item 4): a drifted multi-block trajectory must improve after
the refine pass, and the mesh-sharded variant must match the vmapped one."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svo_tpu.geometry import se3
from svo_tpu.parallel import global_opt
from svo_tpu.pipeline.state import MapState

FX, FY, CX, CY = 300.0, 300.0, 160.0, 120.0
BASE = 0.5
K_MAT = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)


def make_drifted_state(rng, n_frames=25, n_pts=320, obs_per_frame=48,
                       drift_rot=0.002, drift_trans=0.01,
                       obs_noise=0.2, pnt_noise=0.05):
    """Pipeline-shaped (MapState, poses) with ground truth:

    - GT: gentle forward arc; landmarks scattered ahead of the path.
    - observations: GT projections (+0.2 px noise) in the COO ring, stereo.
    - estimate: poses integrated from GT relative motions corrupted by a
      CONSTANT bias (accumulating drift, like VO); map points near GT.
    """
    # GT trajectory
    gt = [np.eye(4)]
    for i in range(1, n_frames):
        rel = np.eye(4)
        rel[:3, :3] = _rot_y(0.004)
        rel[:3, 3] = [0.02, 0.0, 0.35]
        gt.append(gt[-1] @ rel)
    gt = np.stack(gt)

    # landmarks: ahead of the trajectory, spread in depth
    t_all = gt[:, :3, 3]
    pts = []
    for i in range(n_pts):
        f = rng.integers(0, n_frames)
        base = t_all[f]
        pts.append(base + [rng.uniform(-6, 6), rng.uniform(-2, 2),
                           rng.uniform(4, 18)])
    pts = np.asarray(pts)

    # drifted estimate: constant bias on every relative motion
    bias = np.eye(4)
    bias[:3, :3] = _rot_y(drift_rot)
    bias[:3, 3] = [drift_trans, 0, 0]
    est = [gt[0].copy()]
    for i in range(1, n_frames):
        rel = np.linalg.inv(gt[i - 1]) @ gt[i]
        est.append(est[-1] @ rel @ bias)
    est = np.stack(est)

    # observations: project GT points with GT poses
    M = 1 << 12
    O = 1 << 14
    obs_uv, obs_pid, obs_fid = [], [], []
    for f in range(n_frames):
        T_cw = np.linalg.inv(gt[f])
        Xc = pts @ T_cw[:3, :3].T + T_cw[:3, 3]
        z = Xc[:, 2]
        u = FX * Xc[:, 0] / np.maximum(z, 1e-6) + CX
        v = FY * Xc[:, 1] / np.maximum(z, 1e-6) + CY
        vis = (z > 1.0) & (u >= 0) & (u < 2 * CX) & (v >= 0) & (v < 2 * CY)
        ids = np.nonzero(vis)[0]
        rng.shuffle(ids)
        ids = ids[:obs_per_frame]
        for p in ids:
            du = rng.normal(0, obs_noise) if obs_noise else 0.0
            dv = rng.normal(0, obs_noise) if obs_noise else 0.0
            obs_uv.append([u[p] + du, v[p] + dv,
                           u[p] + du - FX * BASE / z[p]])
            obs_pid.append(p)
            obs_fid.append(f)
    n_o = len(obs_pid)
    uv = np.zeros((O, 3), np.float32)
    uv[:n_o] = obs_uv
    pid = np.full((O,), -1, np.int32)
    pid[:n_o] = obs_pid
    fid = np.full((O,), -1, np.int32)
    fid[:n_o] = obs_fid

    points = np.zeros((M, 3), np.float32)
    points[:n_pts] = pts + (
        rng.normal(0, pnt_noise, pts.shape) if pnt_noise else 0.0
    )

    mp = MapState(
        points=jnp.asarray(points),
        n_points=jnp.int32(n_pts),
        obs_u=jnp.asarray(uv[:, 0]),
        obs_v=jnp.asarray(uv[:, 1]),
        obs_ur=jnp.asarray(uv[:, 2]),
        obs_pid=jnp.asarray(pid),
        obs_fid=jnp.asarray(fid),
        obs_cursor=jnp.int32(n_o),
    )
    F = 64
    poses = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    poses[:n_frames] = est.astype(np.float32)
    return mp, jnp.asarray(poses), gt.astype(np.float32), est.astype(np.float32)


def _ate(poses, gt):
    return float(np.sqrt(np.mean(
        np.sum((poses[:, :3, 3] - gt[:, :3, 3]) ** 2, axis=-1)
    )))


def test_refine_improves_drifted_trajectory(rng):
    n = global_opt.block_span(4, 7)  # 22
    mp, poses, gt, est = make_drifted_state(rng, n_frames=n)
    ate_before = _ate(est[:n], gt[:n])
    assert ate_before > 0.05, "drift generator too tame to test anything"

    res = global_opt.refine_global(
        mp, poses, jnp.int32(n - 1),
        jnp.asarray(K_MAT), jnp.float32(FX * BASE),
        n_blocks=4, cams_per_block=7, n_points=512, n_obs=2048,
        ba_iterations=14, pg_iterations=10,
    )
    out = np.asarray(res.poses[:n])
    ate_after = _ate(out, gt[:n])
    # per-block BA must actually reduce its cost somewhere
    assert np.all(np.asarray(res.ba_cost) <= np.asarray(res.ba_cost0) + 1e-3)
    assert ate_after < 0.2 * ate_before, (
        f"refine did not help: {ate_before:.3f} -> {ate_after:.3f}"
    )
    assert int(res.frame_lo) == 0


def test_refine_near_gt_trajectory_is_noop(rng):
    """Round-4 regression test (VERDICT r03 item 2): on a trajectory the
    front-end already nailed, refinement must not move it — the r03 gate
    accepted gauge-slid candidates (poses+points transported coherently,
    span cost still low) and degraded good bench streams 0.07 -> 0.25 m."""
    n = global_opt.block_span(4, 7)

    # exact fixture: GT poses, GT points, noiseless observations — ANY
    # trajectory movement is transport/injection, not re-estimation
    mp, poses, gt, est = make_drifted_state(
        rng, n_frames=n, drift_rot=0.0, drift_trans=0.0,
        obs_noise=0.0, pnt_noise=0.0,
    )
    assert _ate(est[:n], gt[:n]) < 1e-5  # est IS gt here

    res = global_opt.refine_global(
        mp, poses, jnp.int32(n - 1),
        jnp.asarray(K_MAT), jnp.float32(FX * BASE),
        n_blocks=4, cams_per_block=7, n_points=512, n_obs=2048,
        ba_iterations=14, pg_iterations=10,
    )
    out = np.asarray(res.poses[:n])
    assert _ate(out, gt[:n]) < 2e-4, (
        f"refine moved an exact trajectory: {_ate(out, gt[:n])}"
    )
    max_shift = float(np.abs(out[:, :3, 3] - est[:n, :3, 3]).max())
    assert max_shift < 2e-4, f"pose translation moved {max_shift} m"

    # noisy fixture (0.2 px obs / 5 cm point noise): movement must stay at
    # the re-estimation noise floor, never transport-scale
    mp2, poses2, gt2, est2 = make_drifted_state(
        rng, n_frames=n, drift_rot=0.0, drift_trans=0.0
    )
    res2 = global_opt.refine_global(
        mp2, poses2, jnp.int32(n - 1),
        jnp.asarray(K_MAT), jnp.float32(FX * BASE),
        n_blocks=4, cams_per_block=7, n_points=512, n_obs=2048,
        ba_iterations=14, pg_iterations=10,
    )
    out2 = np.asarray(res2.poses[:n])
    ate2 = _ate(out2, gt2[:n])
    assert ate2 < 2e-2, f"refine degraded a near-GT trajectory: {ate2}"


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_refine_sharded_matches_vmapped(rng):
    from jax.sharding import Mesh

    n = global_opt.block_span(4, 7)
    mp, poses, gt, est = make_drifted_state(rng, n_frames=n)
    args = (
        mp, poses, jnp.int32(n - 1),
        jnp.asarray(K_MAT), jnp.float32(FX * BASE),
    )
    kw = dict(cams_per_block=7, n_points=512, n_obs=2048)
    ref = global_opt.refine_global(
        *args, n_blocks=4, ba_iterations=8, pg_iterations=8, **kw
    )
    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("ba_block",))
    sh = global_opt.refine_global_sharded(
        *args, mesh=mesh, ba_iterations=8, pg_iterations=8, **kw
    )
    np.testing.assert_allclose(
        np.asarray(sh.poses[:n]), np.asarray(ref.poses[:n]), atol=1e-4
    )
    ate_ref = _ate(np.asarray(ref.poses[:n]), gt)
    ate_sh = _ate(np.asarray(sh.poses[:n]), gt)
    assert abs(ate_ref - ate_sh) < 1e-3
