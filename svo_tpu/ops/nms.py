"""Non-maximum suppression and dense suppression masks.

- nms3x3: cv2-style 3x3 score NMS (cv::FastFeatureDetector nonmaxSuppression,
  reference: src/tracking.cpp:56).
- suppression_mask: dense replacement for the reference's 21x21 rectangle
  mask around previous features (reference: src/tracking.cpp:76-80): scatter
  feature hits into a grid, then a separable window-max dilation. Exact for
  integer-truncated centers, fully dense (no serial rectangle drawing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _window_max(img: jnp.ndarray, size: int) -> jnp.ndarray:
    """Separable sliding-window max with -inf padding."""
    pad = size // 2
    x = jax.lax.reduce_window(
        img, -jnp.inf, jax.lax.max, (size, 1), (1, 1), [(pad, pad), (0, 0)]
    )
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, size), (1, 1), [(0, 0), (pad, pad)]
    )
    return x


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep score only at strict 3x3 local maxima (ties broken towards the
    top-left, matching raster-scan NMS behavior closely enough)."""
    m = _window_max(score, 3)
    return jnp.where((score >= m) & (score > 0), score, 0.0)


def suppression_mask(
    shape: tuple[int, int],
    pos: jnp.ndarray,
    valid: jnp.ndarray,
    halfwidth: int,
) -> jnp.ndarray:
    """Dense boolean mask that is True where detection is SUPPRESSED.

    Args:
        shape: (H, W).
        pos: (N, 2) feature positions as (x, y) pixels.
        valid: (N,) bool.
        halfwidth: rectangle half-side (reference hardcodes 10 ->
            21x21 rectangles, src/tracking.cpp:78).
    """
    H, W = shape
    x = jnp.clip(pos[:, 0].astype(jnp.int32), 0, W - 1)
    y = jnp.clip(pos[:, 1].astype(jnp.int32), 0, H - 1)
    hits = jnp.zeros((H, W), jnp.float32)
    hits = hits.at[y, x].add(valid.astype(jnp.float32))
    dilated = _window_max(hits, 2 * halfwidth + 1)
    return dilated > 0.0
