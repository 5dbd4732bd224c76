"""Global refinement driven from LIVE pipeline state: keyframe-block
partitioned BA + pose-graph consensus across block boundaries.

SURVEY.md §2.3 item 4 / §5 long-context analog: the map is partitioned into
contiguous keyframe blocks (each device owns one block's cameras, points and
observations), per-block windowed BA runs independently (no collective — the
blocks are separate optimization problems, unlike the point-sharded
psum-reduced mode in parallel/ba.py), and a pose graph over the union of
block cameras reconciles the solutions.

Block geometry: consecutive blocks OVERLAP BY TWO frames (stride = C-2).
Each block's first camera is its BA gauge anchor and keeps whatever absolute
drift the trajectory had — so the relative edge (anchor -> cam1) measured
from the block solution is contaminated by that absolute drift, while edges
between two FREE cameras are clean (both snap to the map). The two-frame
overlap guarantees every consecutive-frame pair is covered by at least one
clean edge, letting the graph drop every non-first block's anchor edge; with
one-frame overlap the anchor edges would be load-bearing and the consensus
would split the difference between drifted and corrected chains instead of
following the corrections.

Everything from the MapState observation ring to the pose write-back is
device-side jittable code — no host NumPy repartitioning (the round-1 gap:
parallel/ba.py:37 shard_problem is a host-side test utility only).

Reference anchor: the reference's back-end thread is an empty TODO loop
(src/map.cpp:84-88) and nothing distributed exists; this layer is the
framework's answer to BASELINE.json config #5.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from svo_tpu.ba.solver import solve_ba
from svo_tpu.ba.window import extract_window
from svo_tpu.ba.pose_graph import PoseGraph, optimize_pose_graph
from svo_tpu.geometry import se3
from svo_tpu.pipeline.state import MapState


class RefineResult(NamedTuple):
    map: MapState
    poses: jnp.ndarray       # (F,4,4) updated trajectory
    frame_lo: jnp.ndarray    # first frame refined
    ba_cost0: jnp.ndarray    # (B,) per-block initial robust cost
    ba_cost: jnp.ndarray     # (B,) per-block final robust cost
    pg_cost0: jnp.ndarray    # pose-graph cost before consensus
    pg_cost: jnp.ndarray     # pose-graph cost after consensus
    accepted: jnp.ndarray    # bool — span-wide cost gate verdict
    span_cost0: jnp.ndarray  # span reprojection cost before refinement
    span_cost: jnp.ndarray   # span reprojection cost of the refined state


def block_span(n_blocks: int, cams_per_block: int) -> int:
    """Frames covered by n_blocks blocks overlapping by two frames."""
    return (n_blocks - 1) * (cams_per_block - 2) + cams_per_block


@partial(
    jax.jit,
    static_argnames=("n_blocks", "cams_per_block", "n_points", "n_obs"),
)
def extract_blocks(
    mp: MapState,
    poses_wc: jnp.ndarray,
    frame_hi: jnp.ndarray,
    n_blocks: int,
    cams_per_block: int,
    n_points: int,
    n_obs: int,
):
    """Partition the trailing trajectory window into B keyframe blocks.

    Block b covers frames [hi_b - cams_per_block + 1, hi_b] with
    hi_b = frame_hi - (B-1-b)*(cams_per_block-2): consecutive blocks share
    two boundary frames. Pure device code — a vmap of the windowed
    extraction over per-block frame ranges."""
    stride = cams_per_block - 2
    his = frame_hi - stride * (n_blocks - 1 - jnp.arange(n_blocks))
    problems, mappings = jax.vmap(
        lambda hi: extract_window(
            mp, poses_wc, hi, n_cams=cams_per_block,
            n_points=n_points, n_obs=n_obs,
        )
    )(his)
    return problems, mappings


@partial(
    jax.jit,
    static_argnames=(
        "n_blocks", "cams_per_block", "n_points", "n_obs",
        "ba_iterations", "pg_iterations",
    ),
)
def refine_global(
    mp: MapState,
    poses_wc: jnp.ndarray,
    frame_hi: jnp.ndarray,
    K_mat: jnp.ndarray,
    baseline_fx: jnp.ndarray,
    n_blocks: int = 4,
    cams_per_block: int = 7,
    n_points: int = 512,
    n_obs: int = 2048,
    ba_iterations: int = 12,
    pg_iterations: int = 10,
    huber_delta: float = 5.0,
    reject_threshold: float = 100.0,
) -> RefineResult:
    """Block-partitioned BA + pose-graph consensus on the live state.

    reject_threshold defaults WIDER than the in-pipeline window BA (100 px vs
    20): global refinement runs on drifted trajectories whose reprojection
    errors legitimately exceed the online outlier cutoff; a tight cutoff
    zeroes every robust weight and freezes LM in a zero-gradient plateau.

    The vmapped per-block solve is embarrassingly parallel over blocks; under
    a mesh the natural sharding is one block per device
    (refine_global_sharded runs exactly that with shard_map).
    """
    problems, mappings = extract_blocks(
        mp, poses_wc, frame_hi, n_blocks, cams_per_block, n_points, n_obs
    )

    # per-block BA (independent problems; each anchors its own first camera,
    # keeping the block in the global frame)
    res = jax.vmap(
        lambda p: solve_ba(
            p, K_mat, baseline_fx,
            iterations=ba_iterations, n_fixed=1, huber_delta=huber_delta,
            reject_threshold=reject_threshold,
        )
    )(problems)

    cand_mp, cand_poses, frame_lo, pg = _consensus_and_writeback(
        mp, poses_wc, frame_hi, problems, mappings, res,
        n_blocks, cams_per_block, pg_iterations,
    )
    return _gated_result(
        mp, poses_wc, frame_hi, cand_mp, cand_poses, frame_lo, res, pg,
        K_mat, baseline_fx, block_span(n_blocks, cams_per_block),
        n_points * n_blocks, n_obs * n_blocks, huber_delta, reject_threshold,
    )


def refine_global_sharded(
    mp: MapState,
    poses_wc: jnp.ndarray,
    frame_hi: jnp.ndarray,
    K_mat: jnp.ndarray,
    baseline_fx: jnp.ndarray,
    mesh,
    axis: str = "ba_block",
    **kw,
):
    """Mesh-parallel variant: one keyframe block per device.

    The block extraction + BA runs under shard_map with each device owning
    its (1, ...) block slice of the problem; the small pose-graph consensus
    is replicated (it is O(B*C) poses — cheap). MapState and the trajectory
    are replicated inputs; only the per-block BA work is distributed."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_blocks = mesh.shape[axis]
    kw.setdefault("cams_per_block", 7)
    kw.setdefault("n_points", 512)
    kw.setdefault("n_obs", 2048)
    ba_iterations = kw.pop("ba_iterations", 12)
    pg_iterations = kw.pop("pg_iterations", 10)
    huber_delta = kw.pop("huber_delta", 5.0)
    reject_threshold = kw.pop("reject_threshold", 100.0)
    C = kw["cams_per_block"]

    problems, mappings = extract_blocks(
        mp, poses_wc, frame_hi, n_blocks, C, kw["n_points"], kw["n_obs"]
    )

    def per_block(problem):
        problem = jax.tree.map(lambda x: x[0], problem)
        res = solve_ba(
            problem, K_mat, baseline_fx,
            iterations=ba_iterations, n_fixed=1, huber_delta=huber_delta,
            reject_threshold=reject_threshold,
        )
        return jax.tree.map(lambda x: x[None], res)

    spec = jax.tree.map(lambda _: P(axis), problems)
    res_struct = jax.eval_shape(per_block, problems)
    out_spec = jax.tree.map(lambda _: P(axis), res_struct)
    problems_sh = jax.device_put(
        problems, jax.tree.map(lambda s: NamedSharding(mesh, s), spec)
    )
    res = jax.jit(
        jax.shard_map(
            per_block, mesh=mesh, in_specs=(spec,), out_specs=out_spec,
            check_vma=False,
        )
    )(problems_sh)

    cand_mp, cand_poses, frame_lo, pg = _consensus_and_writeback(
        mp, poses_wc, frame_hi, problems, mappings, res,
        n_blocks, C, pg_iterations,
    )
    return _gated_result(
        mp, poses_wc, frame_hi, cand_mp, cand_poses, frame_lo, res, pg,
        K_mat, baseline_fx, block_span(n_blocks, C),
        kw["n_points"] * n_blocks, kw["n_obs"] * n_blocks,
        huber_delta, reject_threshold,
    )


def _span_cost(
    mp, poses_wc, frame_hi, K_mat, baseline_fx, span, n_points, n_obs,
    huber_delta, reject_threshold,
):
    """Robust reprojection cost of (poses, points) over the whole refined
    span's observations — the BA objective itself, used as the acceptance
    metric for a refinement sweep."""
    prob, _ = extract_window(
        mp, poses_wc, frame_hi, n_cams=span, n_points=n_points, n_obs=n_obs
    )
    return solve_ba(
        prob, K_mat, baseline_fx, iterations=0,
        huber_delta=huber_delta, reject_threshold=reject_threshold,
    ).cost0


@partial(jax.jit, static_argnames=("n_blocks", "cams_per_block", "pg_iterations"))
def _consensus_and_writeback(
    mp, poses_wc, frame_hi, problems, mappings, res,
    n_blocks, cams_per_block, pg_iterations,
):
    B, C = n_blocks, cams_per_block
    stride = C - 2
    n_nodes = block_span(B, C)
    frame_lo = frame_hi - (n_nodes - 1)

    improved = res.cost <= res.cost0
    T_cw_blk = jnp.where(improved[:, None, None, None], res.T_cw, problems.T_cw)
    pts_blk = jnp.where(improved[:, None, None], res.points, problems.points)
    T_wc_blk = se3.inverse(T_cw_blk)

    # --- pose graph over the union of block cameras ---
    # node k = frame frame_lo + k; block b camera i -> node b*stride + i.
    # Edges: consecutive-camera relative poses measured from each block's
    # optimized solution. Anchor edges (i = 0) of non-first blocks are
    # contaminated by the anchor's absolute drift and get weight 0; the
    # two-frame overlap means the previous block supplies a clean edge for
    # that same frame pair.
    node_T = poses_wc[jnp.clip(frame_lo + jnp.arange(n_nodes), 0)]
    node_valid = (frame_lo + jnp.arange(n_nodes)) >= 0

    bb, ii = jnp.meshgrid(
        jnp.arange(B, dtype=jnp.int32),
        jnp.arange(C - 1, dtype=jnp.int32),
        indexing="ij",
    )
    bb, ii = bb.reshape(-1), ii.reshape(-1)
    edge_i = bb * stride + ii
    edge_j = edge_i + 1
    edge_T = se3.compose(
        se3.inverse(T_wc_blk[bb, ii]), T_wc_blk[bb, ii + 1]
    )
    clean = (bb == 0) | (ii >= 1)
    edge_w = (
        problems.cam_valid[bb, ii]
        & problems.cam_valid[bb, ii + 1]
        & clean
    ).astype(jnp.float32)

    # Odometry-prior edges from the ORIGINAL trajectory (down-weighted):
    # where the block evidence is strong it dominates (1-2 unit-weight edges
    # per pair), where it is weak the prior keeps the span near the
    # front-end solution instead of letting unobservable gauge modes wander.
    ks = jnp.arange(n_nodes - 1, dtype=jnp.int32)
    prior_i = ks
    prior_j = ks + 1
    node_frames = frame_lo + jnp.arange(n_nodes)
    prior_T = se3.compose(
        se3.inverse(poses_wc[jnp.clip(node_frames[:-1], 0)]),
        poses_wc[jnp.clip(node_frames[1:], 0)],
    )
    prior_w = 0.5 * (node_frames[:-1] >= 0).astype(jnp.float32)
    edge_i = jnp.concatenate([edge_i, prior_i])
    edge_j = jnp.concatenate([edge_j, prior_j])
    edge_T = jnp.concatenate([edge_T, prior_T])
    edge_w = jnp.concatenate([edge_w, prior_w])

    # --- initialize nodes by CHAINING the clean edges from the gauge node.
    # LM alone cannot travel from a heavily drifted init to the corrected
    # chain in a few damped steps (each step is trust-region limited); the
    # chain composition is the exact minimizer of the odometry-only graph and
    # costs one tiny scan. For pair (k, k+1), block b=(k-1)//stride supplies
    # the clean edge (i = k - b*stride falls in [1, C-2]); pair 0 uses block
    # 0's anchor edge, which is clean by gauge definition. ---
    ks = jnp.arange(n_nodes - 1, dtype=jnp.int32)
    chain_b = jnp.where(ks == 0, 0, (ks - 1) // stride)
    chain_i = ks - chain_b * stride
    chain_rel = se3.compose(
        se3.inverse(T_wc_blk[chain_b, chain_i]),
        T_wc_blk[chain_b, chain_i + 1],
    )

    def chain_step(T, rel):
        T = se3.compose(T, rel)
        return T, T

    _, chained = jax.lax.scan(chain_step, node_T[0], chain_rel)
    init_T = jnp.concatenate([node_T[:1], chained], axis=0)

    graph = PoseGraph(
        T_wc=init_T, node_valid=node_valid,
        edge_i=edge_i, edge_j=edge_j, edge_T=edge_T, edge_w=edge_w,
    )
    pg = optimize_pose_graph(graph, iterations=pg_iterations, n_fixed=1)
    pg_ok = pg.cost <= pg.cost0
    node_T_new = jnp.where(pg_ok, pg.T_wc, init_T)

    # --- write back poses ---
    F = poses_wc.shape[0]
    fidx = frame_lo + jnp.arange(n_nodes)
    fidx = jnp.where((fidx >= 0) & node_valid, fidx, F)  # F -> dropped
    poses_out = poses_wc.at[fidx].set(node_T_new, mode="drop")

    # --- write back points, carried by each block's rigid correction,
    #     referenced at cam1 (the first FREE camera — the anchor is
    #     deliberately left at its drifted absolute pose) ---
    ref_nodes = jnp.arange(B) * stride + 1
    C_b = se3.compose(node_T_new[ref_nodes], se3.inverse(T_wc_blk[:, 1]))
    pts_corr = jax.vmap(se3.transform)(C_b, pts_blk)
    M = mp.points.shape[0]
    pid = jnp.where(
        problems.pnt_valid & (mappings.slot_to_pid >= 0), mappings.slot_to_pid, M
    )  # (B,P); on overlap-shared points the winning block is unspecified
    # (XLA scatter with duplicate indices has no defined application order;
    # both candidates are valid corrections, so either outcome is fine)
    points = mp.points.at[pid.reshape(-1)].set(pts_corr.reshape(-1, 3), mode="drop")

    return mp._replace(points=points), poses_out, frame_lo, pg


def _gated_result(
    mp, poses_wc, frame_hi, cand_mp, cand_poses, frame_lo, res, pg,
    K_mat, baseline_fx, span, n_points, n_obs, huber_delta, reject_threshold,
):
    """Accept the refined (map, poses) only if the span-wide robust
    reprojection cost does not increase — refinement is 'improvement or
    parity', never regression (the BA objective is the arbiter; on a
    trajectory the front-end already nailed, block re-solves + chaining can
    only add noise, and this gate keeps the original)."""
    cost0 = _span_cost(
        mp, poses_wc, frame_hi, K_mat, baseline_fx,
        span, n_points, n_obs, huber_delta, reject_threshold,
    )
    cost1 = _span_cost(
        cand_mp, cand_poses, frame_hi, K_mat, baseline_fx,
        span, n_points, n_obs, huber_delta, reject_threshold,
    )
    accept = jnp.isfinite(cost1) & (cost1 <= cost0)
    out_points = jnp.where(accept, cand_mp.points, mp.points)
    out_poses = jnp.where(accept, cand_poses, poses_wc)
    return RefineResult(
        map=mp._replace(points=out_points),
        poses=out_poses,
        frame_lo=frame_lo,
        ba_cost0=res.cost0,
        ba_cost=res.cost,
        pg_cost0=pg.cost0,
        pg_cost=pg.cost,
        accepted=accept,
        span_cost0=cost0,
        span_cost=cost1,
    )
