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

from svo_tpu.ba.solver import refine_alternate, solve_ba
from svo_tpu.ba.window import extract_window, write_back
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
    cost_per_obs: jnp.ndarray  # mean initial robust cost per valid obs


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
        "ba_iterations", "pg_iterations", "alt_points_only",
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
    recover_cost_per_obs: float = 10.0,
    alt_points_only: bool = True,
) -> RefineResult:
    """Two-regime global refinement on the live state (round-4 redesign).

    CONSERVATIVE regime (the default, when the span is self-consistent —
    mean initial robust cost per observation <= recover_cost_per_obs):
    alternating resection-intersection over the WHOLE span
    (ba.solver.refine_alternate). Point polish removes one-shot stereo
    triangulation bias; pose polish is per-camera PnP against the fixed map.
    Gauge-sliding transport is structurally impossible, so a good trajectory
    is never degraded (the r03 regression).

    AGGRESSIVE regime (localization failure — large reprojection errors
    against the span's own map): keyframe-block partitioned BA + chained
    re-init + pose-graph consensus, which can rebuild a heavily drifted span
    that local descent cannot reach.

    reject_threshold defaults WIDER than the in-pipeline window BA (100 px vs
    20): recovery runs on broken spans whose reprojection errors legitimately
    exceed the online outlier cutoff; a tight cutoff zeroes every robust
    weight and freezes LM in a zero-gradient plateau. The conservative path
    uses the tighter min(reject, 20) — a self-consistent span has sub-pixel
    residuals and a wide cutoff only lets mistracks drag the polish.

    Round-5 cost/regression restructure (VERDICT r04 items 2+3):
    - the conservative candidate is POINTS-ONLY by construction
      (refine_alternate points_only=True against the unmoved shipped poses;
      its pose output was dead compute per ADVICE r04), and is accepted
      only on a >= (1 - cons_margin) relative span-cost improvement —
      marginal polish of an already-good span is a no-op instead of a
      noise-floor perturbation of future PnP;
    - the aggressive candidate (block BA + consensus + its two acceptance
      span-costs) sits under a lax.cond and is SKIPPED entirely on
      self-consistent spans — the common case in a healthy run — cutting
      the per-sweep device cost roughly in half (under vmap the cond
      lowers to both-branches+select, so the batched bench path keeps its
      old cost).

    The vmapped per-block solve is embarrassingly parallel over blocks; under
    a mesh the natural sharding is one block per device
    (refine_global_sharded runs exactly that with shard_map).
    """
    cons_margin = 0.9
    span = block_span(n_blocks, cams_per_block)
    P_full = n_points * n_blocks
    O_full = n_obs * n_blocks
    frame_lo = frame_hi - (span - 1)

    # --- conservative candidate: full-span points-only alternation ---
    full_prob, full_map = extract_window(
        mp, poses_wc, frame_hi, n_cams=span, n_points=P_full, n_obs=O_full
    )
    alt = refine_alternate(
        full_prob, K_mat, baseline_fx, rounds=ba_iterations // 2 + 2,
        n_fixed=1, huber_delta=huber_delta,
        reject_threshold=jnp.minimum(reject_threshold, 20.0),
        points_only=alt_points_only,
    )
    alt_ok = jnp.isfinite(alt.cost) & (alt.cost <= alt.cost0)
    cons_mp, _ = write_back(
        mp, poses_wc, full_map, full_prob.T_cw,
        jnp.where(alt_ok, alt.points, full_prob.points),
        full_prob.pnt_valid, full_prob.cam_valid,
    )

    cost0 = _span_cost(
        mp, poses_wc, frame_hi, K_mat, baseline_fx,
        span, P_full, O_full, huber_delta, reject_threshold,
    )
    cost_pp = _span_cost(
        cons_mp, poses_wc, frame_hi, K_mat, baseline_fx,
        span, P_full, O_full, huber_delta, reject_threshold,
    )

    # --- regime selection: is the span consistent with its own map? ---
    aggressive = alt.cost0 > recover_cost_per_obs * jnp.maximum(
        alt.n_obs, 1
    ).astype(alt.cost0.dtype)

    # --- aggressive candidate: block BA + consensus, skipped when the
    #     span is healthy ---
    f32 = alt.cost0.dtype

    def agg_branch(_):
        problems, mappings = extract_blocks(
            mp, poses_wc, frame_hi, n_blocks, cams_per_block, n_points, n_obs
        )
        res = jax.vmap(
            lambda p: solve_ba(
                p, K_mat, baseline_fx,
                iterations=ba_iterations, n_fixed=1, huber_delta=huber_delta,
                reject_threshold=reject_threshold,
            )
        )(problems)
        agg_mp, agg_poses, _, pg = _consensus_and_writeback(
            mp, poses_wc, frame_hi, problems, mappings, res,
            n_blocks, cams_per_block, pg_iterations,
        )
        cost1 = _span_cost(
            agg_mp, agg_poses, frame_hi, K_mat, baseline_fx,
            span, P_full, O_full, huber_delta, reject_threshold,
        )
        cost1b = _span_cost(
            mp, agg_poses, frame_hi, K_mat, baseline_fx,
            span, P_full, O_full, huber_delta, reject_threshold,
        )
        return (
            agg_mp.points, agg_poses, res.cost0, res.cost,
            pg.cost0, pg.cost, cost1, cost1b,
        )

    def cons_branch(_):
        zB = jnp.zeros((n_blocks,), f32)
        z = jnp.zeros((), f32)
        return (
            mp.points, poses_wc, zB, zB, z, z,
            jnp.asarray(jnp.inf, f32), jnp.asarray(jnp.inf, f32),
        )

    (agg_points, agg_poses, ba_cost0, ba_cost, pg_cost0, pg_cost, cost1,
     cost1b) = jax.lax.cond(aggressive, agg_branch, cons_branch, None)

    # --- acceptance ---
    # aggressive joint gate: BA objective must not regress AND the
    # anti-gauge-slide check (candidate poses vs the UNMOVED map) must hold.
    joint = (
        jnp.isfinite(cost1) & (cost1 <= cost0)
        & jnp.isfinite(cost1b) & (cost1b <= 2.0 * cost0)
    )
    # conservative points-only gate WITH margin (VERDICT r04 item 2): a
    # polish that wins less than (1-cons_margin) of the span cost is within
    # the refinement noise floor — applying it perturbed future PnP on
    # already-good streams (bench fwd 0.050 -> 0.064 m in r04) for no
    # measurable objective gain. Below-margin sweeps are now no-ops.
    acc_cons = jnp.isfinite(cost_pp) & (cost_pp <= cons_margin * cost0)
    acc_pts = jnp.where(aggressive, joint, acc_cons)
    acc_pose = aggressive & joint

    cand_points = jnp.where(aggressive, agg_points, cons_mp.points)
    out_points = jnp.where(acc_pts, cand_points, mp.points)
    out_poses = jnp.where(acc_pose, agg_poses, poses_wc)
    return RefineResult(
        map=mp._replace(points=out_points),
        poses=out_poses,
        frame_lo=frame_lo,
        ba_cost0=ba_cost0,
        ba_cost=ba_cost,
        pg_cost0=pg_cost0,
        pg_cost=pg_cost,
        accepted=acc_pts | acc_pose,
        span_cost0=cost0,
        span_cost=jnp.where(aggressive, cost1, cost_pp),
        cost_per_obs=alt.cost0 / jnp.maximum(alt.n_obs, 1).astype(f32),
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
    and the conservative full-span alternation are replicated (O(span)
    poses + batched small solves — cheap). MapState and the trajectory are
    replicated inputs; only the per-block BA work is distributed."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_blocks = mesh.shape[axis]
    kw.setdefault("cams_per_block", 7)
    kw.setdefault("n_points", 512)
    kw.setdefault("n_obs", 2048)
    ba_iterations = kw.pop("ba_iterations", 12)
    pg_iterations = kw.pop("pg_iterations", 10)
    huber_delta = kw.pop("huber_delta", 5.0)
    reject_threshold = kw.pop("reject_threshold", 100.0)
    recover_cost_per_obs = kw.pop("recover_cost_per_obs", 10.0)
    C = kw["cams_per_block"]

    span = block_span(n_blocks, C)
    P_full = kw["n_points"] * n_blocks
    O_full = kw["n_obs"] * n_blocks
    full_prob, full_map = extract_window(
        mp, poses_wc, frame_hi, n_cams=span, n_points=P_full, n_obs=O_full
    )
    alt = refine_alternate(
        full_prob, K_mat, baseline_fx, rounds=ba_iterations // 2 + 2,
        n_fixed=1, huber_delta=huber_delta,
        reject_threshold=jnp.minimum(reject_threshold, 20.0),
        points_only=True,
    )
    alt_ok = jnp.isfinite(alt.cost) & (alt.cost <= alt.cost0)
    cons_mp, _ = write_back(
        mp, poses_wc, full_map, full_prob.T_cw,
        jnp.where(alt_ok, alt.points, full_prob.points),
        full_prob.pnt_valid, full_prob.cam_valid,
    )

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

    agg_mp, agg_poses, frame_lo, pg = _consensus_and_writeback(
        mp, poses_wc, frame_hi, problems, mappings, res,
        n_blocks, C, pg_iterations,
    )
    aggressive = alt.cost0 > recover_cost_per_obs * jnp.maximum(
        alt.n_obs, 1
    ).astype(alt.cost0.dtype)
    return _gated_result(
        mp, poses_wc, frame_hi, cons_mp, agg_mp.points, agg_poses,
        frame_lo, res, pg, K_mat, baseline_fx, span, P_full, O_full,
        huber_delta, reject_threshold, aggressive,
        alt.cost0 / jnp.maximum(alt.n_obs, 1).astype(alt.cost0.dtype),
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

    # --- candidate init #2: CHAIN the clean edges from the gauge node.
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
    chain_T = jnp.concatenate([node_T[:1], chained], axis=0)

    # Init SELECTION (round-4 fix for the bench refined-pass regression):
    # the chain exactly fits the block edges, so on an already-good
    # trajectory it re-injects every block solve's noise, compounded over
    # the span — the measured 0.07 -> 0.25 m forward-stream degradation.
    # Start LM from whichever init has the lower GRAPH cost (block edges +
    # down-weighted odometry priors): a good incoming trajectory wins and
    # LM only polishes it; a heavily drifted one loses to the chain, which
    # restores the recovery capability the chain was built for.
    def graph_at(T):
        return PoseGraph(
            T_wc=T, node_valid=node_valid,
            edge_i=edge_i, edge_j=edge_j, edge_T=edge_T, edge_w=edge_w,
        )

    def graph_cost(T):
        from svo_tpu.ba.pose_graph import _edge_residuals

        r, w = _edge_residuals(T, graph_at(T))
        return jnp.sum(w * jnp.sum(r * r, axis=-1))

    use_chain = graph_cost(chain_T) < graph_cost(node_T)
    init_T = jnp.where(use_chain, chain_T, node_T)

    pg = optimize_pose_graph(graph_at(init_T), iterations=pg_iterations, n_fixed=1)
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
    mp, poses_wc, frame_hi, cons_mp, agg_points, agg_poses, frame_lo, res, pg,
    K_mat, baseline_fx, span, n_points, n_obs, huber_delta, reject_threshold,
    aggressive, cost_per_obs, cons_margin: float = 0.9,
):
    """Acceptance gating shared by refine_global_sharded (refine_global
    inlines the same logic under its lax.cond):

    AGGRESSIVE regime — both span-cost checks must pass:
    (a) cost(agg poses, agg points) <= cost(orig) — the BA objective
        itself must not regress; and
    (b) cost(agg poses, ORIGINAL points) <= 2x cost(orig) — the round-4
        anti-gauge-slide check. A block re-solve (or the chained re-init)
        can transport poses AND points coherently along weakly observable
        modes: reprojection cost stays low while the trajectory walks away
        from truth. Scoring the candidate poses against the UNMOVED map
        breaks that coherence.

    CONSERVATIVE regime — the points-only polish applies iff it improves
    the span cost by a real margin (>= 1 - cons_margin relative): polish
    within the noise floor is a no-op instead of a perturbation of future
    PnP (VERDICT r04 item 2). Poses never move in this regime."""
    cost0 = _span_cost(
        mp, poses_wc, frame_hi, K_mat, baseline_fx,
        span, n_points, n_obs, huber_delta, reject_threshold,
    )
    cost1 = _span_cost(
        mp._replace(points=agg_points), agg_poses, frame_hi, K_mat,
        baseline_fx, span, n_points, n_obs, huber_delta, reject_threshold,
    )
    cost1b = _span_cost(
        mp, agg_poses, frame_hi, K_mat, baseline_fx,
        span, n_points, n_obs, huber_delta, reject_threshold,
    )
    joint = (
        jnp.isfinite(cost1) & (cost1 <= cost0)
        & jnp.isfinite(cost1b) & (cost1b <= 2.0 * cost0)
    )
    cost_pp = _span_cost(
        cons_mp, poses_wc, frame_hi, K_mat, baseline_fx,
        span, n_points, n_obs, huber_delta, reject_threshold,
    )
    acc_cons = jnp.isfinite(cost_pp) & (cost_pp <= cons_margin * cost0)
    acc_pts = jnp.where(aggressive, joint, acc_cons)
    acc_pose = aggressive & joint
    accept = acc_pts | acc_pose
    cand_points = jnp.where(aggressive, agg_points, cons_mp.points)
    out_points = jnp.where(acc_pts, cand_points, mp.points)
    out_poses = jnp.where(acc_pose, agg_poses, poses_wc)
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
        span_cost=jnp.where(aggressive, cost1, cost_pp),
        cost_per_obs=cost_per_obs,
    )
