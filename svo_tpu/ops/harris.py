"""Dense Harris corner response.

Used to rank multi-scale FAST corners in the ORB-style detector, matching the
reference's cv::ORB with HARRIS_SCORE (reference: src/tracking.cpp:40-52).
OpenCV's ORB HarrisResponses uses a 7x7 block sum of Sobel-gradient products
with k = 0.04; same formulation here, computed densely.
"""

from __future__ import annotations

import jax.numpy as jnp

from svo_tpu.ops.pyramid import box_filter, sobel_gradients

HARRIS_K = 0.04
BLOCK = 7


def harris_response(img: jnp.ndarray, block: int = BLOCK, k: float = HARRIS_K) -> jnp.ndarray:
    """(H,W) Harris response: det(M) - k*tr(M)^2 over a block window."""
    ix, iy = sobel_gradients(img)
    sxx = box_filter(ix * ix, block)
    syy = box_filter(iy * iy, block)
    sxy = box_filter(ix * iy, block)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - k * tr * tr
