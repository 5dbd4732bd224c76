"""Single-chip vmapped multi-stream VO must match per-stream execution."""

import numpy as np

from svo_tpu.config import Config
from svo_tpu.geometry import camera as cam_mod
from svo_tpu.io.synthetic import SyntheticSequence
from svo_tpu.parallel.batched import BatchedStereoVO
from svo_tpu.pipeline.odometry import StereoVO


def _make(S, F, shape):
    seqs = [
        SyntheticSequence(n_frames=F, shape=shape, fx=200.0, speed=0.2 + 0.02 * s,
                          seed=s)
        for s in range(S)
    ]
    all_frames = [list(sq) for sq in seqs]
    cfg = Config(use_orb=False, image_height=shape[0], image_width=shape[1])
    camera = cam_mod.from_intrinsics(200.0, 200.0, 160.0, 92.0, seqs[0].baseline)
    return all_frames, cfg, camera


def test_batched_matches_single():
    S, F = 3, 5
    shape = (184, 320)
    all_frames, cfg, camera = _make(S, F, shape)

    bvo = BatchedStereoVO(cfg, camera, S)
    bvo.start(
        np.stack([fr[0][1] for fr in all_frames]),
        np.stack([fr[0][2] for fr in all_frames]),
    )
    for t in range(1, F):
        bvo.process(
            np.stack([fr[t][1] for fr in all_frames]),
            np.stack([fr[t][2] for fr in all_frames]),
        )
    trajs = bvo.trajectories(F)
    assert trajs.shape == (S, F, 4, 4)

    vo = StereoVO(cfg, camera, seed=1)
    res = vo.run(all_frames[1])
    np.testing.assert_allclose(trajs[1], res.poses[:F], atol=1e-3)

    assert not np.allclose(trajs[0][:, :3, 3], trajs[2][:, :3, 3], atol=1e-3)


def test_batched_chunked_matches_single_stream_cadenced():
    """The batched cadenced chunk step (vmap over streams, static keyframe
    schedule) must reproduce a single-stream run with the same cadence."""
    S, F = 2, 5  # 1 bootstrap + 4 = one chunk of 4
    shape = (184, 320)
    all_frames, cfg, camera = _make(S, F, shape)

    l0 = np.stack([fr[0][1] for fr in all_frames])
    r0 = np.stack([fr[0][2] for fr in all_frames])

    def u8(x):
        return np.clip(x, 0, 255).astype(np.uint8)

    # (K, S, H, W) frame-major chunk
    lefts = np.stack([np.stack([u8(fr[t][1]) for fr in all_frames])
                      for t in range(1, F)])
    rights = np.stack([np.stack([u8(fr[t][2]) for fr in all_frames])
                       for t in range(1, F)])

    a = BatchedStereoVO(cfg, camera, S, chunk=F - 1, kf_cadence=2)
    assert a.chunk == F - 1 and a.kf_cadence == 2
    a.start(l0, r0)
    a.process_chunk(lefts, rights)
    traj_chunk = a.trajectories(F)

    for s in range(S):
        vo = StereoVO(cfg, camera, seed=s, chunk=F - 1, kf_cadence=2)
        res = vo.run_chunked(all_frames[s])
        np.testing.assert_allclose(traj_chunk[s], res.poses[:F], atol=1e-3)


def test_batched_refine_runs_and_respects_gate():
    """The vmapped between-chunk global refiner (bench path) must execute,
    keep every stream's trajectory finite, update the recursive pose to the
    refined trajectory head, and leave the ATE no worse (the span-cost gate
    guarantees improvement-or-parity on the BA objective; on these short
    clean runs the trajectory must stay within the same accuracy band)."""
    from svo_tpu.eval.trajectory import ate_rmse
    from svo_tpu.io.synthetic import SyntheticSequence

    S, F = 2, 13  # 1 bootstrap + 3 chunks of 4
    shape = (184, 320)
    all_frames, cfg, camera = _make(S, F, shape)

    def u8(x):
        return np.clip(x, 0, 255).astype(np.uint8)

    bvo = BatchedStereoVO(cfg, camera, S, chunk=4, kf_cadence=2)
    bvo.make_refiner(n_blocks=2, cams_per_block=5, n_points=256, n_obs=1024,
                     ba_iterations=4, pg_iterations=4)
    bvo.start(
        np.stack([fr[0][1] for fr in all_frames]),
        np.stack([fr[0][2] for fr in all_frames]),
    )
    for c0 in range(1, F - 1, 4):
        lefts = np.stack([np.stack([u8(fr[t][1]) for fr in all_frames])
                          for t in range(c0, c0 + 4)])
        rights = np.stack([np.stack([u8(fr[t][2]) for fr in all_frames])
                           for t in range(c0, c0 + 4)])
        bvo.process_chunk(lefts, rights)
    before = bvo.trajectories(F)
    accepted = bvo.refine()
    after = bvo.trajectories(F)
    assert accepted.shape == (S,)
    assert np.isfinite(after).all()
    # recursive pose was synced to the refined trajectory head
    head = np.asarray(bvo.state.pose)
    np.testing.assert_allclose(head, after[:, F - 1], atol=1e-6)
    for s in range(S):
        gt = SyntheticSequence(
            n_frames=F, shape=shape, fx=200.0, speed=0.2 + 0.02 * s, seed=s
        ).gt_poses
        a0 = ate_rmse(before[s], gt)
        a1 = ate_rmse(after[s], gt)
        assert a1 < max(1.5 * a0, a0 + 0.01), (s, a0, a1)


def test_batched_shape_validation():
    S, F = 2, 5
    shape = (184, 320)
    all_frames, cfg, camera = _make(S, F, shape)
    bvo = BatchedStereoVO(cfg, camera, S, chunk=4, kf_cadence=2)
    import pytest

    with pytest.raises(ValueError, match="expected shape"):
        bvo.start(np.zeros((S, 100, 100)), np.zeros((S, 100, 100)))
    bvo.start(
        np.stack([fr[0][1] for fr in all_frames]),
        np.stack([fr[0][2] for fr in all_frames]),
    )
    with pytest.raises(ValueError, match="frame-major"):
        # stream-major instead of frame-major
        bvo.process_chunk(
            np.zeros((S, 4) + shape, np.uint8), np.zeros((S, 4) + shape, np.uint8)
        )
