"""Pose-graph optimization over SE(3) relative-motion constraints.

SURVEY.md §2.3 calls for "pose-graph optimization across partitions
(consensus on shared boundary keyframes)" as the cross-block layer above
distributed BA: nodes are keyframe poses, edges are relative-pose
measurements (odometry links, block-boundary constraints, loop closures),
each with a scalar information weight.

Residual per edge (i, j): r = log( Z_ij^-1 · T_i^-1 · T_j )  in se(3),
minimized by Gauss-Newton with left-multiplicative twist updates on every
non-anchored node. Fixed-shape edge table (COO + mask), dense 6N x 6N solve
(windows/partition boundaries are small), jittable end to end.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from svo_tpu.geometry import se3


class PoseGraph(NamedTuple):
    T_wc: jnp.ndarray       # (N,4,4) node poses (camera-to-world)
    node_valid: jnp.ndarray  # (N,) bool
    edge_i: jnp.ndarray     # (E,) i32 source node
    edge_j: jnp.ndarray     # (E,) i32 target node
    edge_T: jnp.ndarray     # (E,4,4) measured T_i^-1 @ T_j
    edge_w: jnp.ndarray     # (E,) f32 information weight (0 disables)


class PoseGraphResult(NamedTuple):
    T_wc: jnp.ndarray
    cost0: jnp.ndarray
    cost: jnp.ndarray


def _edge_residuals(T_wc, graph: PoseGraph):
    """(E,6) residuals and the (E,) validity weights.

    Non-finite residuals (se3.log blows up near a pi rotation, which a
    degenerate measurement on a ZERO-WEIGHT edge can legitimately produce)
    are zeroed with their weight — otherwise `w * r^2` yields 0 * nan = nan
    and one dead edge poisons the whole graph cost."""
    Ti = T_wc[graph.edge_i]
    Tj = T_wc[graph.edge_j]
    pred = se3.compose(se3.inverse(Ti), Tj)
    err = se3.compose(se3.inverse(graph.edge_T), pred)
    r = se3.log(err)
    w = graph.edge_w * graph.node_valid[graph.edge_i] * graph.node_valid[graph.edge_j]
    finite = jnp.all(jnp.isfinite(r), axis=-1)
    w = w * finite.astype(w.dtype)
    r = jnp.where(finite[:, None], r, 0.0)
    return r, w


def _adjoint(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) adjoint for twist order [v, w]: Adj = [[R, [t]x R], [0, R]]."""
    R = se3.rotation(T)
    t = se3.translation(T)
    tx = se3.hat(t)
    top = jnp.concatenate([R, tx @ R], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


@partial(jax.jit, static_argnames=("iterations", "n_fixed"))
def optimize_pose_graph(
    graph: PoseGraph,
    iterations: int = 10,
    n_fixed: int = 1,
    init_lambda: float = 1e-3,
) -> PoseGraphResult:
    """Levenberg-Marquardt on the pose graph. The first n_fixed nodes are
    anchored.

    Linearization (right-multiplicative updates T <- T exp(delta), residual
    r = log(Z^-1 Ti^-1 Tj)): r_new ~ r + J_j dj + J_i di with J_j ~ I and
    J_i = -Adj(Tj^-1 Ti) (the right-Jacobian of log is ~I for the small
    residuals of VO graphs). The block-sparse normal system assembles by
    scatter-add into an (N,N,6,6) table and is solved dense (pose graphs in
    this pipeline are window/boundary sized).

    Damping is ADAPTIVE (multiplicative on the diagonal, halved on accepted
    steps, grown 8x on rejections): a chain graph's normal matrix has weak
    long-lever modes (eigmin ~1e-4) along which a pure GN step overshoots far
    outside the linearization basin — with a fixed tiny damping the step is
    rejected every iteration and the graph never moves."""
    N = graph.T_wc.shape[0]
    fixed = (jnp.arange(N) < n_fixed) | (~graph.node_valid)

    def cost_at(T):
        r, w = _edge_residuals(T, graph)
        return jnp.sum(w * jnp.sum(r * r, axis=-1))

    def lm_step(carry, _):
        T, lam, cost = carry
        r, w = _edge_residuals(T, graph)  # (E,6), (E,)
        Ti = T[graph.edge_i]
        Tj = T[graph.edge_j]
        Ji = -_adjoint(se3.compose(se3.inverse(Tj), Ti))  # (E,6,6)
        # J_j = I

        wJi = Ji * w[:, None, None]
        H = jnp.zeros((N, N, 6, 6), r.dtype)
        H = H.at[graph.edge_i, graph.edge_i].add(
            jnp.einsum("eki,ekj->eij", Ji, wJi)
        )
        eyeE = jnp.broadcast_to(jnp.eye(6, dtype=r.dtype), Ji.shape)
        H = H.at[graph.edge_j, graph.edge_j].add(eyeE * w[:, None, None])
        Hij = jnp.einsum("eki,kj->eij", wJi, jnp.eye(6, dtype=r.dtype))
        H = H.at[graph.edge_i, graph.edge_j].add(Hij)
        H = H.at[graph.edge_j, graph.edge_i].add(jnp.swapaxes(Hij, -1, -2))

        b = jnp.zeros((N, 6), r.dtype)
        b = b.at[graph.edge_i].add(jnp.einsum("eki,ek->ei", wJi, r))
        b = b.at[graph.edge_j].add(w[:, None] * r)

        # gauge + adaptive damping, flatten to (6N,6N)
        Hf = jnp.where(
            fixed[:, None, None, None] | fixed[None, :, None, None], 0.0, H
        )
        Hf = Hf.transpose(0, 2, 1, 3).reshape(N * 6, N * 6)
        fixed6 = jnp.repeat(fixed, 6)
        diag = jnp.diag(Hf)
        Hf = Hf + jnp.diag(
            jnp.where(fixed6, 1.0, lam * (diag + 1e-8) + 1e-9)
        )
        bf = jnp.where(fixed[:, None], 0.0, b).reshape(N * 6)
        delta = -jnp.linalg.solve(Hf, bf).reshape(N, 6)
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, jnp.zeros_like(delta))

        T_new = se3.compose(T, se3.exp(delta))
        T_new = jnp.where(fixed[:, None, None], T, T_new)
        cost_new = cost_at(T_new)
        accept = jnp.isfinite(cost_new) & (cost_new <= cost)
        T = jnp.where(accept, T_new, T)
        cost = jnp.where(accept, cost_new, cost)
        lam = jnp.where(accept, lam * 0.5, lam * 8.0)
        return (T, lam, cost), None

    cost0 = cost_at(graph.T_wc)
    (T, _, cost), _ = jax.lax.scan(
        lm_step,
        (graph.T_wc, jnp.asarray(init_lambda, graph.T_wc.dtype), cost0),
        None,
        length=iterations,
    )
    return PoseGraphResult(T_wc=T, cost0=cost0, cost=cost)


def odometry_graph(
    poses: jnp.ndarray,
    valid: jnp.ndarray,
    extra_edges: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
    odom_weight: float = 1.0,
) -> PoseGraph:
    """Build a chain graph from a trajectory: consecutive-frame odometry
    edges measured from the current estimates, plus optional extra edges
    (i, j, T_meas) such as loop closures or cross-partition constraints."""
    N = poses.shape[0]
    ei = jnp.arange(N - 1, dtype=jnp.int32)
    ej = ei + 1
    eT = se3.compose(se3.inverse(poses[ei]), poses[ej])
    ew = jnp.full((N - 1,), odom_weight, jnp.float32) * (
        valid[ei] & valid[ej]
    ).astype(jnp.float32)
    if extra_edges is not None:
        xi, xj, xT = extra_edges
        ei = jnp.concatenate([ei, xi.astype(jnp.int32)])
        ej = jnp.concatenate([ej, xj.astype(jnp.int32)])
        eT = jnp.concatenate([eT, xT])
        ew = jnp.concatenate(
            [ew, jnp.ones((xi.shape[0],), jnp.float32)]
        )
    return PoseGraph(
        T_wc=poses, node_valid=valid, edge_i=ei, edge_j=ej, edge_T=eT, edge_w=ew
    )
