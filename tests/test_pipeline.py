"""End-to-end pipeline test: full VO loop on a synthetic stereo sequence with
exact ground truth, asserting ATE bounds (SURVEY.md §4: integration tests with
ATE/RPE bounds against ground truth)."""

import numpy as np
import pytest

from svo_tpu.config import Config
from svo_tpu.eval.trajectory import ate_rmse, rpe, umeyama_alignment
from svo_tpu.geometry import camera as cam_mod
from svo_tpu.io.synthetic import SyntheticSequence
from svo_tpu.pipeline.odometry import StereoVO


@pytest.fixture(scope="module")
def small_seq():
    return SyntheticSequence(n_frames=15, shape=(184, 320), fx=200.0, speed=0.25)


def _run(seq, use_orb=False):
    cfg = Config(
        use_orb=use_orb,
        image_height=seq.shape[0],
        image_width=seq.shape[1],
    )
    camera = cam_mod.from_intrinsics(
        seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2], seq.baseline
    )
    vo = StereoVO(cfg, camera)
    return vo.run(list(seq))


def test_e2e_fast_detector(small_seq):
    res = _run(small_seq, use_orb=False)
    assert res.n_frames == small_seq.n_frames
    traveled = np.linalg.norm(
        np.diff(small_seq.gt_poses[:, :3, 3], axis=0), axis=1
    ).sum()
    ate = ate_rmse(res.poses, small_seq.gt_poses)
    assert ate < 0.05 * traveled, f"ATE {ate:.3f}m over {traveled:.1f}m"
    # pipeline health
    assert res.metrics[1:, 2].min() > 20, "feature starvation"
    assert res.metrics[1:, 1].mean() > 0.7, "low inlier ratio"
    assert res.kf_flags[0]


def test_e2e_cadenced_chunked(small_seq):
    """Static-keyframe-cadence chunked path must hold the same ATE bound as
    the dynamic-rule path (the throughput mode must not cost accuracy)."""
    seq = small_seq
    cfg = Config(use_orb=False, image_height=seq.shape[0], image_width=seq.shape[1])
    camera = cam_mod.from_intrinsics(
        seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2], seq.baseline
    )
    vo = StereoVO(cfg, camera, chunk=7, kf_cadence=7)
    res = vo.run_chunked(list(seq))  # 15 = 1 bootstrap + 2 chunks of 7
    traveled = np.linalg.norm(
        np.diff(seq.gt_poses[:, :3, 3], axis=0), axis=1
    ).sum()
    ate = ate_rmse(res.poses, seq.gt_poses)
    assert ate < 0.05 * traveled, f"ATE {ate:.3f}m over {traveled:.1f}m"
    # keyframes land exactly on the static schedule (bootstrap + 1, 8)
    assert res.kf_flags[0] and res.kf_flags[1] and res.kf_flags[8]
    assert not res.kf_flags[2:8].any()


def test_umeyama():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(50, 3))
    R0, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(R0) < 0:
        R0[:, 0] *= -1
    t0 = np.array([1.0, -2.0, 3.0])
    dst = src @ R0.T + t0
    R, t, s = umeyama_alignment(src, dst)
    np.testing.assert_allclose(R, R0, atol=1e-8)
    np.testing.assert_allclose(t, t0, atol=1e-8)
    assert abs(s - 1) < 1e-8


def test_ate_zero_for_identical():
    poses = np.tile(np.eye(4), (10, 1, 1))
    poses[:, 2, 3] = np.arange(10)
    assert ate_rmse(poses, poses) < 1e-12
    t_err, r_err = rpe(poses, poses)
    assert t_err < 1e-12 and r_err < 1e-6
