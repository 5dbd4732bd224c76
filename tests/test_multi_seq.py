"""Multi-stream DP VO on the 8-device CPU mesh: streams must be independent
and match single-stream execution."""

import jax
import numpy as np
import pytest

from svo_tpu.config import Config
from svo_tpu.geometry import camera as cam_mod
from svo_tpu.io.synthetic import SyntheticSequence
from svo_tpu.parallel.multi_seq import MultiStereoVO
from svo_tpu.pipeline.odometry import StereoVO

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@needs_8
def test_multi_stream_matches_single():
    S, F = 8, 6
    shape = (184, 320)
    seqs = [
        SyntheticSequence(n_frames=F, shape=shape, fx=200.0, speed=0.2 + 0.02 * s,
                          seed=s)
        for s in range(S)
    ]
    all_frames = [list(sq) for sq in seqs]
    cfg = Config(use_orb=False, image_height=shape[0], image_width=shape[1])
    camera = cam_mod.from_intrinsics(200.0, 200.0, 160.0, 92.0, seqs[0].baseline)

    multi = MultiStereoVO(cfg, camera, S)
    multi.start(
        np.stack([fr[0][1] for fr in all_frames]),
        np.stack([fr[0][2] for fr in all_frames]),
    )
    for t in range(1, F):
        multi.process(
            np.stack([fr[t][1] for fr in all_frames]),
            np.stack([fr[t][2] for fr in all_frames]),
        )
    trajs = multi.trajectories(F)
    assert trajs.shape == (S, F, 4, 4)

    # fleet health: one psum-aggregated metrics row per step
    # ([n_tracked, inlier_ratio, n_features, is_kf, n_map_points] summed
    # over the S streams)
    health = np.asarray(multi.fleet_health)
    assert health.shape == (5,)
    assert health[2] > 0  # total live features across the fleet
    assert 0.0 <= health[1] <= S  # sum of per-stream inlier ratios

    # stream 3 must match a standalone run with the same seed
    vo = StereoVO(cfg, camera, seed=3)
    res = vo.run(all_frames[3])
    np.testing.assert_allclose(trajs[3], res.poses[:F], atol=1e-4)

    # streams with different motion must differ
    assert not np.allclose(trajs[0][:, :3, 3], trajs[7][:, :3, 3], atol=1e-3)
