"""Pose-graph optimization tests: drifted odometry chain + anchor/closure
edges snaps back toward ground truth."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from svo_tpu.ba.pose_graph import PoseGraph, odometry_graph, optimize_pose_graph
from svo_tpu.geometry import se3


def chain(n, step=0.5):
    T = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    for i in range(n):
        T[i, :3, 3] = [0, 0, step * i]
        T[i, :3, :3] = Rotation.from_euler("y", 0.01 * i).as_matrix()
    return T


def test_consistent_graph_zero_cost():
    T = jnp.asarray(chain(8))
    g = odometry_graph(T, jnp.ones(8, bool))
    res = optimize_pose_graph(g, iterations=3)
    assert float(res.cost0) < 1e-8
    np.testing.assert_allclose(np.asarray(res.T_wc), np.asarray(T), atol=1e-6)


def test_drift_corrected_by_anchor_edge(rng):
    """Odometry edges from GT, but the estimates have accumulated drift; an
    extra edge anchoring the last node to node 0 (a 'loop closure' with the
    true relative pose) must pull the whole chain back."""
    n = 10
    T_true = chain(n)
    # drifted estimate: growing perturbation
    T_est = T_true.copy()
    for i in range(1, n):
        T_est[i, :3, 3] += np.array([0.05, 0.02, 0.0]) * i
        T_est[i, :3, :3] = (
            Rotation.from_euler("z", 0.004 * i).as_matrix() @ T_est[i, :3, :3]
        )

    # edges measure TRUE relative motions (odometry is accurate locally)
    ei = jnp.arange(n - 1, dtype=jnp.int32)
    ej = ei + 1
    Ttrue_j = jnp.asarray(T_true)
    eT = se3.compose(se3.inverse(Ttrue_j[ei]), Ttrue_j[ej])
    # loop closure: node 0 -> node n-1 true relative pose, strong weight
    xi = jnp.asarray([0], jnp.int32)
    xj = jnp.asarray([n - 1], jnp.int32)
    xT = se3.compose(se3.inverse(Ttrue_j[0]), Ttrue_j[n - 1])[None]

    g = PoseGraph(
        T_wc=jnp.asarray(T_est),
        node_valid=jnp.ones(n, bool),
        edge_i=jnp.concatenate([ei, xi]),
        edge_j=jnp.concatenate([ej, xj]),
        edge_T=jnp.concatenate([eT, xT]),
        edge_w=jnp.concatenate([jnp.ones(n - 1), jnp.asarray([5.0])]),
    )
    res = optimize_pose_graph(g, iterations=25)
    assert float(res.cost) < float(res.cost0) * 1e-2
    err = np.linalg.norm(
        np.asarray(res.T_wc)[:, :3, 3] - T_true[:, :3, 3], axis=-1
    )
    err0 = np.linalg.norm(T_est[:, :3, 3] - T_true[:, :3, 3], axis=-1)
    assert err.max() < 0.1 * err0.max(), f"{err.max():.3f} vs initial {err0.max():.3f}"


def test_zero_weight_edges_ignored():
    T = jnp.asarray(chain(5))
    g = odometry_graph(T, jnp.ones(5, bool))
    # corrupt one edge measurement but zero its weight
    bad_T = g.edge_T.at[2].set(jnp.eye(4))
    g2 = g._replace(edge_T=bad_T, edge_w=g.edge_w.at[2].set(0.0))
    res = optimize_pose_graph(g2, iterations=5)
    np.testing.assert_allclose(np.asarray(res.T_wc), np.asarray(T), atol=1e-5)
