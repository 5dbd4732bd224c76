"""Batched pyramidal Lucas-Kanade optical flow.

TPU-native replacement for cv::calcOpticalFlowPyrLK at both reference call
sites: stereo left->right matching (src/tracking.cpp:98-105, 11x11 window,
maxLevel 3, 30 iters, eps 1e-3) and temporal prev->curr tracking
(src/tracking.cpp:157-164, 21x21, maxLevel 3, 50 iters, eps 1e-3,
OPTFLOW_LK_GET_MIN_EIGENVALS -> min-eigenvalue rejection).

TPU-first design (no per-pixel pointer chasing):
- For each pyramid level, a PATCH of side `patch` is extracted ONCE per
  feature at an integer-aligned position (vmapped dynamic_slice from the
  level image: contiguous-row gathers, cheap). The patch is large enough to
  contain the LK window plus an iteration search margin.
- All LK iterations then run DENSE inside these (N, patch, patch) arrays:
  fractional sampling is a 4-way bilinear blend of shifted static slices —
  pure VPU work, no gathers in the inner loop.
- Template gradients and the 2x2 normal matrix G are computed once per level
  (cv2 does the same); each iteration only recomputes the image difference
  and the right-hand side b. Iterations are a lax.scan with a convergence
  mask (eps semantics preserved; converged features simply stop moving —
  bit-identical result to early exit).
- Features whose window would leave the valid patch area or the image are
  marked lost, matching cv2's border behavior.

Min-eigenvalue rejection: cv2 (with OPTFLOW_LK_GET_MIN_EIGENVALS) kills
features whose min eigenvalue of G / window_area falls below minEigThreshold;
same rule implemented here (also applied without the flag, as cv2 does for
G's invertibility check).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from svo_tpu.config import KltParams
from svo_tpu.ops.pyramid import klt_pyramid, scharr_gradients


class KltResult(NamedTuple):
    pos: jnp.ndarray     # (N, 2) tracked positions (x, y) in the new image
    status: jnp.ndarray  # (N,) bool — survived tracking
    err: jnp.ndarray     # (N,) min eigenvalue (flag semantics) at level 0


def _extract_patches(
    img: jnp.ndarray, centers_int: jnp.ndarray, patch: int
) -> jnp.ndarray:
    """Extract (N, patch, patch) windows whose top-left is centers_int -
    patch//2 (integer, clamped). vmapped dynamic_slice -> row-contiguous
    gathers, one per feature per level."""

    def one(c):
        y0 = c[1] - patch // 2
        x0 = c[0] - patch // 2
        return jax.lax.dynamic_slice(img, (y0, x0), (patch, patch))

    return jax.vmap(one)(centers_int)


def _bilinear_window(
    patches: jnp.ndarray, offset: jnp.ndarray, window: int
) -> jnp.ndarray:
    """Sample (N, window, window) at fractional offset inside (N, P, P)
    patches. offset is (N, 2) (x, y) of the window's top-left relative to the
    patch's top-left; must satisfy 0 <= offset <= P - window - 1.

    TPU formulation: bilinear sampling as two batched matmuls with
    iota-built selection-and-blend matrices, S_y @ patch @ S_x^T, where
    S_y[n, r, p] = (p == iy+r)(1-fy) + (p == iy+r+1) fy. A vmapped
    dynamic_slice would lower to a gather PER LK ITERATION — the dominant
    tracker cost; this runs on the MXU instead."""
    N, P, _ = patches.shape
    ox, oy = offset[:, 0], offset[:, 1]
    ix = jnp.floor(ox).astype(jnp.int32)
    iy = jnp.floor(oy).astype(jnp.int32)
    fx = (ox - ix)[:, None]  # (N,1)
    fy = (oy - iy)[:, None]

    rows = jax.lax.broadcasted_iota(jnp.int32, (window, P), 0)  # r
    cols = jax.lax.broadcasted_iota(jnp.int32, (window, P), 1)  # p

    def sel(base, frac):
        # (N, window, P): blend matrix for one axis
        b = base[:, None, None] + rows[None]
        eq0 = (cols[None] == b).astype(patches.dtype)
        eq1 = (cols[None] == b + 1).astype(patches.dtype)
        return eq0 * (1.0 - frac[..., None]) + eq1 * frac[..., None]

    Sy = sel(iy, fy)  # (N, w, P)
    Sx = sel(ix, fx)  # (N, w, P)
    tmp = jnp.einsum("nrp,npq->nrq", Sy, patches)     # (N, w, P)
    return jnp.einsum("nrq,ncq->nrc", tmp, Sx)        # (N, w, w)


@partial(
    jax.jit,
    static_argnames=(
        "window", "max_level", "max_iters", "patch_margin", "early_exit_frac"
    ),
)
def _track_impl(
    prev_levels: tuple[jnp.ndarray, ...],
    curr_levels: tuple[jnp.ndarray, ...],
    prev_grad_levels: tuple[tuple[jnp.ndarray, jnp.ndarray], ...],
    pos: jnp.ndarray,
    valid: jnp.ndarray,
    init: jnp.ndarray,
    window: int,
    max_level: int,
    max_iters: int,
    eps: float,
    min_eig_threshold: float,
    patch_margin: int,
    early_exit_frac: float = 1.0,
):
    N = pos.shape[0]
    w = window
    half = (w - 1) / 2.0
    patch = w + 2 * patch_margin + 2  # +2 for the bilinear +1 slack each side
    eps2 = eps * eps
    win_area = float(w * w)

    guess = init / (2.0 ** (max_level + 1))  # will be doubled entering top level
    status = valid
    min_eig_out = jnp.zeros((N,), jnp.float32)

    for level in range(max_level, -1, -1):
        scale = 2.0 ** level
        img_prev = prev_levels[level]
        img_curr = curr_levels[level]
        gx, gy = prev_grad_levels[level]
        H, W = img_prev.shape

        p_lvl = pos / scale  # feature position at this level
        guess = guess * 2.0

        # Level too small for the patch (cv2 likewise clamps maxLevel by
        # window size): skip it, keeping the guess-doubling chain intact.
        if H < patch + 1 or W < patch + 1:
            continue

        # ---- template patch around the (fixed) prev position ----
        def clamp_center(c):
            return jnp.stack(
                [
                    jnp.clip(c[:, 0], patch // 2, W - 1 - patch // 2),
                    jnp.clip(c[:, 1], patch // 2, H - 1 - patch // 2),
                ],
                axis=-1,
            )

        ci = clamp_center(jnp.round(p_lvl).astype(jnp.int32))
        # current-image patch is centered at this level's INITIAL ESTIMATE
        # (prev position + propagated flow guess) so large displacements stay
        # inside the patch; iterations then only refine within the margin.
        ci_c = clamp_center(jnp.round(p_lvl + guess).astype(jnp.int32))

        t_patch = _extract_patches(img_prev, ci, patch)
        gx_patch = _extract_patches(gx, ci, patch)
        gy_patch = _extract_patches(gy, ci, patch)
        c_patch = _extract_patches(img_curr, ci_c, patch)

        # offset of the template window's top-left inside the patch
        base = ci.astype(jnp.float32) - patch // 2   # template patch top-left
        c_base = ci_c.astype(jnp.float32) - patch // 2  # current patch top-left
        t_off = p_lvl - half - base  # (N,2) fractional
        max_off = patch - w - 1.0
        t_in = (
            (t_off[:, 0] >= 0.0)
            & (t_off[:, 0] <= max_off)
            & (t_off[:, 1] >= 0.0)
            & (t_off[:, 1] <= max_off)
        )
        t_off_cl = jnp.clip(t_off, 0.0, max_off)

        T = _bilinear_window(t_patch, t_off_cl, w)  # (N,w,w) template
        Tx = _bilinear_window(gx_patch, t_off_cl, w)
        Ty = _bilinear_window(gy_patch, t_off_cl, w)

        # 2x2 normal matrix (computed once per level, like cv2)
        a11 = jnp.sum(Tx * Tx, axis=(1, 2))
        a12 = jnp.sum(Tx * Ty, axis=(1, 2))
        a22 = jnp.sum(Ty * Ty, axis=(1, 2))
        tr_half = (a11 + a22) * 0.5
        disc = jnp.sqrt(jnp.maximum(tr_half * tr_half - (a11 * a22 - a12 * a12), 0.0))
        min_eig = (tr_half - disc) / win_area
        det = a11 * a22 - a12 * a12
        solvable = (min_eig > min_eig_threshold) & (det > 1e-12)

        status = status & t_in & solvable
        min_eig_out = jnp.where(level == 0, min_eig, min_eig_out)

        inv_det = 1.0 / jnp.where(det > 1e-12, det, 1.0)
        i11 = a22 * inv_det
        i12 = -a12 * inv_det
        i22 = a11 * inv_det

        # ---- iterate: current window at p_lvl + d ----
        # while_loop with an all-converged exit. TPU while_loops carry
        # substantial fixed per-iteration overhead (~0.5-1 ms measured), far
        # exceeding the ~50us of actual VPU work per LK update, so UNROLL
        # LK updates inside each loop iteration and check the global
        # convergence predicate only between groups. cv2's per-feature eps
        # exit typically fires within ~5-10 updates.
        UNROLL = 5

        def one_update(d, conv):
            c_off = p_lvl + d - half - c_base
            in_patch = (
                (c_off[:, 0] >= 0.0)
                & (c_off[:, 0] <= max_off)
                & (c_off[:, 1] >= 0.0)
                & (c_off[:, 1] <= max_off)
            )
            c_off_cl = jnp.clip(c_off, 0.0, max_off)
            Iw = _bilinear_window(c_patch, c_off_cl, w)
            diff = Iw - T
            b1 = jnp.sum(diff * Tx, axis=(1, 2))
            b2 = jnp.sum(diff * Ty, axis=(1, 2))
            du = -(i11 * b1 + i12 * b2)
            dv = -(i12 * b1 + i22 * b2)
            step = jnp.stack([du, dv], axis=-1)
            active = (~conv) & in_patch
            d = jnp.where(active[:, None], d + step, d)
            conv = conv | (du * du + dv * dv < eps2) | (~in_patch)
            return d, conv

        # stragglers allowed to remain unconverged at exit (they keep their
        # current displacement, exactly like hitting cv2's max_iters)
        allowed = int(round((1.0 - early_exit_frac) * N))

        def cond_fn(carry):
            i, d, conv = carry
            n_active = jnp.sum((~(conv | (~status))).astype(jnp.int32))
            return (i < max_iters) & (n_active > allowed)

        def body_fn(carry):
            i, d, conv = carry
            for _ in range(UNROLL):
                d, conv = one_update(d, conv)
            return (i + UNROLL, d, conv)

        d0 = guess
        conv0 = jnp.zeros((N,), bool)
        _, d_final, _ = jax.lax.while_loop(
            cond_fn, body_fn, (jnp.zeros((), jnp.int32), d0, conv0)
        )

        # lost if final window is outside patch (~left the search region) or
        # outside the image at this level
        final_pt = p_lvl + d_final
        inside_img = (
            (final_pt[:, 0] >= 0)
            & (final_pt[:, 0] < W)
            & (final_pt[:, 1] >= 0)
            & (final_pt[:, 1] < H)
        )
        c_off_f = final_pt - half - c_base
        inside_patch = (
            (c_off_f[:, 0] >= -1.0)
            & (c_off_f[:, 0] <= max_off + 1.0)
            & (c_off_f[:, 1] >= -1.0)
            & (c_off_f[:, 1] <= max_off + 1.0)
        )
        status = status & inside_img & inside_patch
        guess = d_final

    new_pos = pos + guess
    # final position must lie inside the level-0 image (cv2 kills these)
    H0, W0 = prev_levels[0].shape
    inside0 = (
        (new_pos[:, 0] >= 0)
        & (new_pos[:, 0] <= W0 - 1)
        & (new_pos[:, 1] >= 0)
        & (new_pos[:, 1] <= H0 - 1)
    )
    status = status & inside0
    return KltResult(pos=new_pos, status=status, err=min_eig_out)


class KltTracker:
    """Pyramid-caching KLT front. Build pyramids once per image, reuse for
    both stereo matching and temporal tracking (the reference recomputes
    OpenCV pyramids inside every calcOpticalFlowPyrLK call)."""

    @staticmethod
    def build_pyramid(img: jnp.ndarray, max_level: int):
        levels = klt_pyramid(img, max_level)
        grads = [scharr_gradients(l) for l in levels]
        return tuple(levels), tuple(grads)

    @staticmethod
    def track(
        prev_pyr,
        curr_pyr,
        pos: jnp.ndarray,
        valid: jnp.ndarray,
        params: KltParams,
        init_flow: jnp.ndarray | None = None,
        patch_margin: int = 8,
    ) -> KltResult:
        """Track features from prev to curr.

        Args:
            prev_pyr: (levels, grads) from build_pyramid on the prev image.
            curr_pyr: same for the curr image (grads unused).
            pos: (N,2) feature positions in prev.
            valid: (N,) mask.
            params: window/iters/eps/min_eig.
            init_flow: optional (N,2) initial displacement at level 0.
        """
        prev_levels, prev_grads = prev_pyr
        curr_levels, _ = curr_pyr
        if init_flow is None:
            init_flow = jnp.zeros_like(pos)
        return _track_impl(
            prev_levels,
            curr_levels,
            prev_grads,
            pos,
            valid,
            init_flow,
            window=params.window,
            max_level=params.max_level,
            max_iters=params.max_iters,
            eps=params.eps,
            min_eig_threshold=params.min_eig_threshold,
            patch_margin=patch_margin,
            early_exit_frac=getattr(params, "early_exit_frac", 1.0),
        )
