"""Window extraction + in-pipeline BA tests."""

import jax
import jax.numpy as jnp
import numpy as np

from svo_tpu.ba.window import (
    extract_kf_window,
    extract_window,
    write_back,
    write_back_kf,
)
from svo_tpu.config import BaParams, Config
from svo_tpu.pipeline.state import MapState


def _mk_map(cfg, n_pts, obs):
    """obs: list of (fid, pid, u, v, ur)."""
    mp = MapState.empty(cfg)
    pts = np.zeros((mp.points.shape[0], 3), np.float32)
    pts[:n_pts] = np.arange(n_pts * 3).reshape(n_pts, 3)
    O = mp.obs_u.shape[0]
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
        obs_u=jnp.asarray(uv[:, 0]),
        obs_v=jnp.asarray(uv[:, 1]),
        obs_ur=jnp.asarray(uv[:, 2]),
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


def test_extract_kf_window_selects_keyframes_only():
    """The keyframe window must pick the last K KEYFRAMES (not frames) and
    keep only observations made at those keyframes."""
    cfg = Config(ba=BaParams(max_points=8, max_obs=16, ring_obs=64))
    obs = [
        (0, 5, 1, 1, -1),   # KF 0 — outside the 2-KF window
        (2, 5, 2, 2, -1),   # KF 2 — in window
        (3, 5, 9, 9, -1),   # frame 3 is NOT a keyframe -> excluded
        (4, 7, 3, 3, 30.5),  # KF 4 — in window
        (4, 5, 4, 4, -1),
    ]
    mp = _mk_map(cfg, n_pts=10, obs=obs)
    F = 16
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (F, 1, 1))
    poses = poses.at[2, 0, 3].set(2.0).at[4, 0, 3].set(4.0)
    kf_flags = jnp.zeros((F,), bool).at[jnp.asarray([0, 2, 4])].set(True)
    problem, mapping = extract_kf_window(
        mp, poses, kf_flags, jnp.int32(5), n_cams=2, n_points=8, n_obs=16
    )
    assert list(np.asarray(mapping.cam_fids)) == [2, 4]
    assert list(np.asarray(problem.cam_valid)) == [True, True]
    ov = np.asarray(problem.obs_valid)
    assert ov.sum() == 3  # frame-0 and frame-3 rows excluded
    # camera slots point at the right keyframes
    cams = np.asarray(problem.obs_cam)[ov]
    uv = np.asarray(problem.obs_uv)[ov]
    got = sorted(zip(cams, uv[:, 0]))
    assert got == [(0, 2.0), (1, 3.0), (1, 4.0)]
    # T_cw is the inverse of the keyframe poses
    assert np.allclose(np.asarray(problem.T_cw)[0][0, 3], -2.0, atol=1e-5)
    assert np.allclose(np.asarray(problem.T_cw)[1][0, 3], -4.0, atol=1e-5)


def test_extract_kf_window_pads_when_few_keyframes():
    cfg = Config(ba=BaParams(max_points=8, max_obs=16, ring_obs=64))
    mp = _mk_map(cfg, n_pts=4, obs=[(2, 1, 5, 5, 2.0)])
    F = 16
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (F, 1, 1))
    kf_flags = jnp.zeros((F,), bool).at[2].set(True)
    problem, mapping = extract_kf_window(
        mp, poses, kf_flags, jnp.int32(5), n_cams=4, n_points=8, n_obs=16
    )
    # padding slots first, then the one real keyframe
    assert list(np.asarray(mapping.cam_fids)) == [-1, -1, -1, 2]
    assert list(np.asarray(problem.cam_valid)) == [False, False, False, True]
    assert np.asarray(problem.obs_valid).sum() == 1
    assert int(np.asarray(problem.obs_cam)[np.asarray(problem.obs_valid)][0]) == 3


def test_write_back_kf_propagates_rigid_correction():
    """Keyframe poses land exactly; intermediate frames ride the rigid
    correction of their preceding window keyframe; frames outside the span
    are untouched."""
    cfg = Config(ba=BaParams(max_points=8, max_obs=16, ring_obs=64))
    obs = [(2, 5, 2, 2, 1.0), (4, 5, 3, 3, 1.0)]
    mp = _mk_map(cfg, n_pts=10, obs=obs)
    F = 16
    poses = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    for f in range(F):
        poses[f, 0, 3] = float(f)  # x = frame id
    poses = jnp.asarray(poses)
    kf_flags = jnp.zeros((F,), bool).at[jnp.asarray([2, 4])].set(True)
    problem, mapping = extract_kf_window(
        mp, poses, kf_flags, jnp.int32(5), n_cams=2, n_points=8, n_obs=16
    )
    # shift both keyframes by +10 in x (world frame)
    T_wc_new = np.array(jax.vmap(jnp.linalg.inv)(problem.T_cw))
    T_wc_new[:, 0, 3] += 10.0
    T_cw_new = jnp.asarray(np.linalg.inv(T_wc_new))
    mp2, poses2 = write_back_kf(
        mp, poses, mapping, jnp.int32(5), T_cw_new,
        jnp.full_like(problem.points, 42.0), problem.pnt_valid,
        problem.cam_valid,
    )
    p2 = np.asarray(poses2)
    # keyframes exact
    assert np.allclose(p2[2][0, 3], 12.0, atol=1e-4)
    assert np.allclose(p2[4][0, 3], 14.0, atol=1e-4)
    # intermediate + trailing frames carried by the rigid correction
    assert np.allclose(p2[3][0, 3], 13.0, atol=1e-4)
    assert np.allclose(p2[5][0, 3], 15.0, atol=1e-4)
    # outside the span: untouched
    assert np.allclose(p2[1][0, 3], 1.0, atol=1e-6)
    assert np.allclose(p2[6][0, 3], 6.0, atol=1e-6)
    # optimized point written
    assert np.allclose(np.asarray(mp2.points)[5], 42.0)


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
            enabled=True, window=2, interval=1, max_points=512,
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
