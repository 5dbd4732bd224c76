"""Pyramidal KLT tests against the cv2 oracle (SURVEY.md §4: LK parity is
hard-part #3 — subpixel bilinear details decide whether tracks survive)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from svo_tpu.config import KltParams
from svo_tpu.ops.klt import KltTracker


def textured_image(rng, h=240, w=320):
    """Smooth random texture with plenty of gradient for LK."""
    img = rng.uniform(0, 255, (h // 4, w // 4)).astype(np.float32)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
    img = cv2.GaussianBlur(img, (5, 5), 1.0)
    return np.clip(img, 0, 255).astype(np.float32)


def shift_image(img, dx, dy):
    """Subpixel translation via cv2 warpAffine (linear)."""
    M = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(
        img, M, (img.shape[1], img.shape[0]), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_REFLECT,
    )


def good_points(img, n=60, margin=30):
    pts = cv2.goodFeaturesToTrack(
        img.astype(np.uint8), n, 0.01, 15,
    )
    pts = pts[:, 0, :]
    h, w = img.shape
    keep = (
        (pts[:, 0] > margin) & (pts[:, 0] < w - margin)
        & (pts[:, 1] > margin) & (pts[:, 1] < h - margin)
    )
    return pts[keep].astype(np.float32)


@pytest.mark.parametrize("shift", [(1.3, -0.7), (5.5, 3.2), (12.0, -9.0)])
def test_klt_translation(rng, shift):
    """Tracked flow must equal the known global translation."""
    dx, dy = shift
    img0 = textured_image(rng)
    img1 = shift_image(img0, dx, dy)
    pts = good_points(img0)
    N = len(pts)
    assert N > 10

    params = KltParams(window=21, max_level=3, max_iters=16)
    pyr0 = KltTracker.build_pyramid(jnp.asarray(img0), params.max_level)
    pyr1 = KltTracker.build_pyramid(jnp.asarray(img1), params.max_level)
    res = KltTracker.track(pyr0, pyr1, jnp.asarray(pts), jnp.ones(N, bool), params)

    st = np.asarray(res.status)
    flow = np.asarray(res.pos) - pts
    assert st.mean() > 0.8, f"lost too many: {st.mean()}"
    err = np.linalg.norm(flow[st] - np.array([dx, dy]), axis=-1)
    assert np.median(err) < 0.25, f"median flow err {np.median(err)}"


def test_klt_matches_cv2(rng):
    """Positions should agree with cv2 calcOpticalFlowPyrLK subpixel-closely."""
    img0 = textured_image(rng)
    img1 = shift_image(img0, 3.7, -2.2)
    # add slight non-uniformity so it's not a pure translation
    img1 = 0.98 * img1 + 2.0
    pts = good_points(img0)
    N = len(pts)

    params = KltParams(window=21, max_level=3, max_iters=16)
    pyr0 = KltTracker.build_pyramid(jnp.asarray(img0), params.max_level)
    pyr1 = KltTracker.build_pyramid(jnp.asarray(img1), params.max_level)
    res = KltTracker.track(pyr0, pyr1, jnp.asarray(pts), jnp.ones(N, bool), params)

    cv_pts, cv_st, _ = cv2.calcOpticalFlowPyrLK(
        img0.astype(np.uint8), img1.astype(np.uint8), pts, None,
        winSize=(21, 21), maxLevel=3,
        criteria=(cv2.TERM_CRITERIA_COUNT + cv2.TERM_CRITERIA_EPS, 50, 0.001),
    )
    cv_st = cv_st[:, 0].astype(bool)
    st = np.asarray(res.status)
    both = st & cv_st
    assert both.sum() > 10
    d = np.linalg.norm(np.asarray(res.pos)[both] - cv_pts[both], axis=-1)
    assert np.median(d) < 0.5, f"median deviation from cv2: {np.median(d):.3f}px"
    assert np.mean(d < 1.5) > 0.9, f"fraction within 1.5px: {np.mean(d < 1.5):.3f}"


def test_klt_loses_borders(rng):
    """Features pushed off the image must be reported lost."""
    img0 = textured_image(rng)
    img1 = shift_image(img0, 40.0, 0.0)
    # points near the right edge exit the image under +40px flow
    pts = np.array([[300.0, 100.0], [310.0, 150.0], [160.0, 120.0]], np.float32)
    params = KltParams(window=21, max_level=3, max_iters=16)
    pyr0 = KltTracker.build_pyramid(jnp.asarray(img0), params.max_level)
    pyr1 = KltTracker.build_pyramid(jnp.asarray(img1), params.max_level)
    res = KltTracker.track(pyr0, pyr1, jnp.asarray(pts), jnp.ones(3, bool), params)
    st = np.asarray(res.status)
    assert not st[0] and not st[1]


def test_klt_flat_region_rejected(rng):
    """Min-eigenvalue gate: features on textureless regions are killed
    (OPTFLOW_LK_GET_MIN_EIGENVALS semantics, reference tracking.cpp:163)."""
    img0 = np.full((240, 320), 128.0, np.float32)
    img0[:, :100] = textured_image(rng)[:, :100]
    img1 = img0.copy()
    pts = np.array([[250.0, 120.0], [50.0, 120.0]], np.float32)  # flat, textured
    params = KltParams(window=21, max_level=3, max_iters=16)
    pyr0 = KltTracker.build_pyramid(jnp.asarray(img0), params.max_level)
    pyr1 = KltTracker.build_pyramid(jnp.asarray(img1), params.max_level)
    res = KltTracker.track(pyr0, pyr1, jnp.asarray(pts), jnp.ones(2, bool), params)
    st = np.asarray(res.status)
    assert not st[0]
    assert st[1]


def test_klt_stereo_params(rng):
    """Stereo call-site parameters (11x11, 30 iters) track a disparity-like
    horizontal shift."""
    img0 = textured_image(rng)
    img1 = shift_image(img0, -7.3, 0.0)
    pts = good_points(img0)
    params = KltParams(window=11, max_level=3, max_iters=16)
    pyr0 = KltTracker.build_pyramid(jnp.asarray(img0), params.max_level)
    pyr1 = KltTracker.build_pyramid(jnp.asarray(img1), params.max_level)
    res = KltTracker.track(pyr0, pyr1, jnp.asarray(pts), jnp.ones(len(pts), bool), params)
    st = np.asarray(res.status)
    flow = np.asarray(res.pos) - pts
    assert st.mean() > 0.7
    err = np.linalg.norm(flow[st] - np.array([-7.3, 0.0]), axis=-1)
    assert np.median(err) < 0.3
