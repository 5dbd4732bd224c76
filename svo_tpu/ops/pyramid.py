"""Image pyramids.

Two pyramid flavors, matching the reference's two consumers:
- KLT pyramid: successive 5x5 Gaussian blur + 2x decimation, the cv2
  pyrDown/buildOpticalFlowPyramid scheme used by cv::calcOpticalFlowPyrLK
  (reference call sites: src/tracking.cpp:98-105, 157-164).
- Detection pyramid: geometric rescale chain (factor 1.2) for the ORB-style
  multi-scale detector (reference: src/tracking.cpp:42-52).

All built from XLA convolutions / resizes — HBM-bandwidth-bound ops that XLA
fuses and tiles well; explicit lower matmul precision is fine here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# pyrDown kernel [1,4,6,4,1]/16, separable.
_PYR_K = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0], jnp.float32) / 16.0


def _sep_filter(img: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Separable 2D filter with REFLECT border (cv2 BORDER_REFLECT_101 is
    close enough at 2px borders for tracking purposes)."""
    pad = k.shape[0] // 2
    x = img[None, None]  # NCHW
    kh = k.reshape(1, 1, -1, 1)
    kw = k.reshape(1, 1, 1, -1)
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID")
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (pad, pad)), mode="reflect")
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID")
    return x[0, 0]


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """cv2-style pyrDown: 5x5 Gaussian blur then take every 2nd pixel.
    Output shape: ceil(H/2) x ceil(W/2)."""
    blurred = _sep_filter(img, _PYR_K)
    return blurred[::2, ::2]


def klt_pyramid(img: jnp.ndarray, max_level: int) -> list[jnp.ndarray]:
    """Levels 0..max_level (cv2 maxLevel semantics: max_level+1 images)."""
    levels = [img]
    for _ in range(max_level):
        levels.append(pyr_down(levels[-1]))
    return levels


def scale_pyramid(img: jnp.ndarray, n_levels: int, scale_factor: float) -> list[jnp.ndarray]:
    """Geometric pyramid for multi-scale detection (ORB scale_factor chain)."""
    h, w = img.shape
    levels = [img]
    for l in range(1, n_levels):
        s = scale_factor ** l
        nh, nw = max(int(round(h / s)), 16), max(int(round(w / s)), 16)
        levels.append(jax.image.resize(img, (nh, nw), method="linear"))
    return levels


def sobel_gradients(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """3x3 Sobel dx, dy (cv2 kernel, no scaling)."""
    smooth = jnp.array([1.0, 2.0, 1.0], jnp.float32)
    diff = jnp.array([-1.0, 0.0, 1.0], jnp.float32)
    pad1 = lambda x, axis: jnp.pad(
        x[None, None],
        ((0, 0), (0, 0), (1, 1) if axis == 0 else (0, 0), (1, 1) if axis == 1 else (0, 0)),
        mode="reflect",
    )
    conv = lambda x, k, axis: jax.lax.conv_general_dilated(
        pad1(x, axis),
        k.reshape(1, 1, -1, 1) if axis == 0 else k.reshape(1, 1, 1, -1),
        (1, 1),
        "VALID",
    )[0, 0]
    ix = conv(conv(img, smooth, 0), diff, 1)
    iy = conv(conv(img, diff, 0), smooth, 1)
    return ix, iy


def scharr_gradients(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """3x3 Scharr dx, dy with cv2's 1/32 normalization — the gradient filter
    cv::calcOpticalFlowPyrLK uses internally for the spatial derivative."""
    smooth = jnp.array([3.0, 10.0, 3.0], jnp.float32) / 32.0
    diff = jnp.array([-1.0, 0.0, 1.0], jnp.float32)
    pad1 = lambda x, axis: jnp.pad(
        x[None, None],
        ((0, 0), (0, 0), (1, 1) if axis == 0 else (0, 0), (1, 1) if axis == 1 else (0, 0)),
        mode="reflect",
    )
    conv = lambda x, k, axis: jax.lax.conv_general_dilated(
        pad1(x, axis),
        k.reshape(1, 1, -1, 1) if axis == 0 else k.reshape(1, 1, 1, -1),
        (1, 1),
        "VALID",
    )[0, 0]
    ix = conv(conv(img, smooth, 0), diff, 1)
    iy = conv(conv(img, diff, 0), smooth, 1)
    return ix, iy


def box_filter(img: jnp.ndarray, size: int) -> jnp.ndarray:
    """Sliding-window sum (not mean) with zero padding, separable."""
    k = jnp.ones((size,), jnp.float32)
    pad = size // 2
    x = img[None, None]
    x = jax.lax.conv_general_dilated(
        x, k.reshape(1, 1, -1, 1), (1, 1), ((pad, pad), (0, 0))
    )
    x = jax.lax.conv_general_dilated(
        x, k.reshape(1, 1, 1, -1), (1, 1), ((0, 0), (pad, pad))
    )
    return x[0, 0]
