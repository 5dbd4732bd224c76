"""Distributed BA over an 8-device CPU mesh vs the single-device solution
(SURVEY.md §4: multi-host tests without a cluster via forced host devices,
asserting distributed BA matches single-host within tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svo_tpu.ba.solver import solve_ba
from svo_tpu.parallel import ba as dist
from tests.test_ba import BASELINE, FX, K_MAT, cam_errors, make_problem


needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_8
def test_distributed_matches_single(rng):
    problem, T_true, pts_true = make_problem(
        rng, n_cams=6, n_pts=128, noise_px=0.3
    )
    K_j = jnp.asarray(K_MAT)
    bfx = jnp.float32(FX * BASELINE)

    single = solve_ba(problem, K_j, bfx, iterations=12)

    mesh = dist.make_mesh(8)
    sharded = dist.shard_problem(problem, 8)
    # every observation must survive the repartition
    assert int(jnp.sum(sharded.obs_valid)) == int(jnp.sum(problem.obs_valid))
    res = dist.solve_ba_distributed(sharded, K_j, bfx, mesh, iterations=12)

    # cameras: every shard returns the (replicated) solution
    T_dist = np.asarray(res.T_cw)
    for s in range(8):
        np.testing.assert_allclose(T_dist[s], T_dist[0], atol=1e-5)

    # distributed must match single-device cameras to f32-reduction tolerance
    np.testing.assert_allclose(T_dist[0], np.asarray(single.T_cw), atol=5e-4)

    # and both must be near ground truth
    rot, trans = cam_errors(T_dist[0], T_true)
    assert trans.max() < 0.05

    # points: reassembled shards match the single-device points. f32 psum
    # reduction-order noise in the reduced camera system propagates into
    # point back-substitution amplified by depth (z^2/(fx b)), so the
    # tolerance is cm-level at 10-30 m depth, not exact.
    pts_dist = np.asarray(res.points).reshape(-1, 3)
    np.testing.assert_allclose(
        pts_dist, np.asarray(single.points), atol=5e-2
    )

    # costs agree (each shard reports the global psum'd cost)
    c = np.asarray(res.cost)
    np.testing.assert_allclose(c, c[0], rtol=1e-5)
    np.testing.assert_allclose(c[0], float(single.cost), rtol=1e-3)


@needs_8
def test_distributed_scaling_smoke(rng):
    """Bigger problem across 8 shards runs and converges."""
    problem, T_true, _ = make_problem(rng, n_cams=8, n_pts=512, noise_px=0.5)
    mesh = dist.make_mesh(8)
    sharded = dist.shard_problem(problem, 8)
    res = dist.solve_ba_distributed(
        sharded, jnp.asarray(K_MAT), jnp.float32(FX * BASELINE), mesh,
        iterations=10,
    )
    rot, trans = cam_errors(np.asarray(res.T_cw)[0], T_true)
    assert trans.max() < 0.1
    assert float(res.cost[0]) < float(res.cost0[0])
