"""Window extraction + in-pipeline BA tests."""

import jax
import jax.numpy as jnp
import numpy as np

from svo_tpu.ba.window import extract_window, write_back
from svo_tpu.config import BaParams, Config
from svo_tpu.pipeline.state import MapState


def _mk_map(cfg, n_pts, obs):
    """obs: list of (fid, pid, u, v, ur)."""
    mp = MapState.empty(cfg)
    pts = np.zeros((mp.points.shape[0], 3), np.float32)
    pts[:n_pts] = np.arange(n_pts * 3).reshape(n_pts, 3)
    O = mp.obs_uv.shape[0]
    uv = np.zeros((O, 3), np.float32)
    pid = np.full(O, -1, np.int32)
    fid = np.full(O, -1, np.int32)
    for i, (f, p, u, v, ur) in enumerate(obs):
        uv[i] = [u, v, ur]
        pid[i] = p
        fid[i] = f
    return mp._replace(
        points=jnp.asarray(pts),
        n_points=jnp.int32(n_pts),
        obs_uv=jnp.asarray(uv),
        obs_pid=jnp.asarray(pid),
        obs_fid=jnp.asarray(fid),
        obs_cursor=jnp.int32(len(obs)),
    )


def test_extract_window_selects_and_remaps():
    cfg = Config(ba=BaParams(max_points=8, max_obs=16, ring_obs=64))
    obs = [
        (0, 5, 1, 1, -1),   # outside window
        (3, 5, 2, 2, -1),
        (4, 7, 3, 3, 30.5),
        (5, 5, 4, 4, -1),
        (5, 2, 5, 5, -1),
    ]
    mp = _mk_map(cfg, n_pts=10, obs=obs)
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (16, 1, 1))
    problem, mapping = extract_window(
        mp, poses, jnp.int32(5), n_cams=3, n_points=8, n_obs=16
    )
    ov = np.asarray(problem.obs_valid)
    assert ov.sum() == 4  # frame-0 row excluded
    assert int(mapping.frame_lo) == 3
    # three distinct points in window -> three slots used
    s2p = np.asarray(mapping.slot_to_pid)
    assert (s2p >= 0).sum() == 3
    assert set(s2p[s2p >= 0]) == {2, 5, 7}
    # observation cam indices are fid - frame_lo
    cams = np.asarray(problem.obs_cam)[ov]
    fids = []
    pids = []
    for c, pslot in zip(cams, np.asarray(problem.obs_pnt)[ov]):
        fids.append(c + 3)
        pids.append(s2p[pslot])
    assert sorted(zip(fids, pids)) == [(3, 5), (4, 7), (5, 2), (5, 5)]
    # stereo column preserved
    uv = np.asarray(problem.obs_uv)[ov]
    assert (uv[:, 2] >= 0).sum() == 1


def test_single_mono_obs_points_gated():
    """Points with one mono observation are under-constrained and must be
    excluded from the window problem."""
    cfg = Config(ba=BaParams(max_points=8, max_obs=16, ring_obs=64))
    obs = [
        (3, 5, 2, 2, -1),          # pid 5: single mono -> gated out
        (4, 7, 3, 3, 1.5),         # pid 7: single stereo -> kept
        (3, 2, 1, 1, -1), (4, 2, 1, 1, -1),  # pid 2: two mono -> kept
    ]
    mp = _mk_map(cfg, n_pts=10, obs=obs)
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (16, 1, 1))
    problem, mapping = extract_window(
        mp, poses, jnp.int32(5), n_cams=3, n_points=8, n_obs=16
    )
    s2p = np.asarray(mapping.slot_to_pid)
    pv = np.asarray(problem.pnt_valid)
    kept = set(s2p[(s2p >= 0) & pv])
    assert kept == {2, 7}


def test_write_back_scatters():
    cfg = Config(ba=BaParams(max_points=8, max_obs=16, ring_obs=64))
    mp = _mk_map(
        cfg, n_pts=10,
        obs=[(3, 5, 2, 2, -1), (4, 5, 2, 2, -1), (4, 7, 3, 3, 1.0)],
    )
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (16, 1, 1))
    problem, mapping = extract_window(
        mp, poses, jnp.int32(5), n_cams=3, n_points=8, n_obs=16
    )
    new_pts = jnp.full_like(problem.points, 99.0)
    T_new = jnp.tile(jnp.eye(4, dtype=jnp.float32), (3, 1, 1)).at[:, 0, 3].set(7.0)
    mp2, poses2 = write_back(
        mp, poses, mapping, T_new, new_pts, problem.pnt_valid, problem.cam_valid
    )
    pts = np.asarray(mp2.points)
    assert np.allclose(pts[5], 99.0) and np.allclose(pts[7], 99.0)
    assert not np.allclose(pts[2], 99.0)  # untouched point
    p2 = np.asarray(poses2)
    # poses 3..5 updated (inverse of T_new -> translation -7 on x)
    assert np.allclose(p2[3][0, 3], -7.0, atol=1e-5)
    assert np.allclose(p2[5][0, 3], -7.0, atol=1e-5)
    assert np.allclose(p2[6], np.eye(4))


def test_pipeline_with_ba_runs():
    """Full pipeline with BA enabled must run and keep ATE bounded."""
    from svo_tpu.eval.trajectory import ate_rmse
    from svo_tpu.geometry import camera as cam_mod
    from svo_tpu.io.synthetic import SyntheticSequence
    from svo_tpu.pipeline.odometry import StereoVO

    seq = SyntheticSequence(n_frames=14, shape=(184, 320), fx=200.0, speed=0.25)
    cfg = Config(
        use_orb=False,
        image_height=184,
        image_width=320,
        ba=BaParams(
            enabled=True, window=6, interval=4, max_points=512,
            max_obs=2048, iterations=5,
        ),
    )
    camera = cam_mod.from_intrinsics(
        seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2], seq.baseline
    )
    vo = StereoVO(cfg, camera)
    res = vo.run(list(seq))
    traveled = np.linalg.norm(np.diff(seq.gt_poses[:, :3, 3], axis=0), axis=1).sum()
    ate = ate_rmse(res.poses, seq.gt_poses)
    assert np.isfinite(ate)
    assert ate < 0.05 * traveled, f"ATE with BA {ate:.3f}m over {traveled:.1f}m"
