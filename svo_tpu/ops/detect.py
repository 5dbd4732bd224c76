"""Feature detection orchestration: FAST or ORB-style multi-scale FAST+Harris,
with suppression of existing tracks and bucketed selection.

Replaces Tracking::extractFeatures' detector stage (reference:
src/tracking.cpp:34-59 detector init, 74-92 extraction):
- FAST mode: cv::FastFeatureDetector(threshold=20, NMS)        -> dense FAST
- ORB mode: cv::ORB(nfeatures, 1.2, 8 levels, HARRIS_SCORE)    -> FAST over a
  scale pyramid, Harris ranking, per-level quota ~ OpenCV's area-proportional
  distribution. The reference never uses ORB descriptors (matching is KLT),
  so the detector is the whole of ORB needed for parity.
- suppression: dense mask replacing the 21x21 rectangles around previous
  features (reference: src/tracking.cpp:76-80).
- selection: bucketed per-cell top-k (fixing the reference's dead bucket.cpp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from svo_tpu.config import Config
from svo_tpu.ops import fast, harris, nms, select
from svo_tpu.ops.pyramid import scale_pyramid


def detect_fast(
    img: jnp.ndarray,
    threshold: float,
    suppress: jnp.ndarray | None,
    cfg: Config,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-scale FAST detection -> (pos (D,2), score (D,), valid (D,)).

    Detects at FastParams.min_threshold and splits candidates into a strong
    tier (margin above `threshold`, the reference's fixed gate) and a weak
    tier that only claims leftover slots (see select.bucketed_topk
    strong_gap) — the starvation rescue for near-textureless frames. The
    score is one dense pass either way: fast_score margins at the low gate
    minus the gap equal margins at the normal gate exactly."""
    low = min(float(cfg.fast_params.min_threshold), threshold)
    score = fast.fast_score(img, low)
    score = nms.nms3x3(score)
    if suppress is not None:
        score = jnp.where(suppress, 0.0, score)
    if cfg.bucket.enabled:
        return select.bucketed_topk(
            score,
            cfg.bucket.bucket_size,
            cfg.bucket.features_per_bucket,
            cfg.capacity.max_detections,
            strong_gap=threshold - low,
        )
    return select.global_topk(score, cfg.capacity.max_detections)


def detect_orb(
    img: jnp.ndarray,
    suppress: jnp.ndarray | None,
    cfg: Config,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """ORB-style multi-scale detection.

    FAST (orb_params.fast_treshold) on each pyramid level, Harris response as
    the ranking score (HARRIS_SCORE, reference src/tracking.cpp:40), positions
    mapped back to level-0 coordinates, per-level candidate quota proportional
    to level area (OpenCV ORB's distribution), global top-nfeatures merge.
    """
    op = cfg.orb_params
    levels = scale_pyramid(img, op.pyr_levels, op.scale_factor)

    # per-level quota proportional to area (factor 1/s^2), matching OpenCV's
    # nfeatures-per-level distribution.
    inv_areas = [op.scale_factor ** (-2.0 * l) for l in range(op.pyr_levels)]
    total = sum(inv_areas)
    quotas = [max(8, int(round(op.nfeatures * a / total))) for a in inv_areas]

    all_pos, all_scores = [], []
    for l, (lv_img, quota) in enumerate(zip(levels, quotas)):
        s = fast.fast_score(lv_img, float(op.fast_treshold))
        s = nms.nms3x3(s)
        # rank by Harris response where FAST fired (HARRIS_SCORE)
        h = harris.harris_response(lv_img)
        ranked = jnp.where(s > 0, h, -jnp.inf)
        pos, scores, valid = select.global_topk_signed(ranked, quota)
        scale = float(op.scale_factor) ** l
        all_pos.append(pos * scale)
        # offset scores per level so Harris magnitudes remain comparable; keep raw
        all_scores.append(jnp.where(valid, scores, -jnp.inf))

    pos = jnp.concatenate(all_pos, axis=0)
    scores = jnp.concatenate(all_scores, axis=0)

    # suppression mask + image bounds at level-0 coords
    H, W = img.shape
    xi = jnp.clip(pos[:, 0].astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(pos[:, 1].astype(jnp.int32), 0, H - 1)
    if suppress is not None:
        scores = jnp.where(suppress[yi, xi], -jnp.inf, scores)

    D = cfg.capacity.max_detections
    k = min(D, scores.shape[0])
    top_scores, top_i = jax.lax.top_k(scores, k)
    out_pos = pos[top_i]
    valid = jnp.isfinite(top_scores)
    if k < D:
        out_pos = jnp.pad(out_pos, ((0, D - k), (0, 0)))
        top_scores = jnp.pad(top_scores, (0, D - k))
        valid = jnp.pad(valid, (0, D - k))
    return out_pos, top_scores, valid


def detect(
    img: jnp.ndarray,
    prev_pos: jnp.ndarray,
    prev_valid: jnp.ndarray,
    cfg: Config,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full extractFeatures detector stage: build the suppression mask from the
    previous frame's features, then detect (reference: src/tracking.cpp:74-92).
    """
    suppress = nms.suppression_mask(img.shape, prev_pos, prev_valid, cfg.mask_halfwidth)
    if cfg.use_orb:
        return detect_orb(img, suppress, cfg)
    return detect_fast(img, float(cfg.fast_params.threshold), suppress, cfg)
