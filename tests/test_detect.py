"""Feature-detection kernel tests against cv2 oracles (SURVEY.md §4)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from svo_tpu.config import Config, BucketParams
from svo_tpu.ops import detect, fast, nms, select


def checker_image(rng, h=120, w=160):
    """Textured test image with corners: random blobs on a gradient."""
    img = rng.uniform(0, 60, (h, w)).astype(np.float32)
    # add strong corner-y squares
    for _ in range(12):
        y, x = rng.integers(10, h - 20), rng.integers(10, w - 20)
        img[y : y + 9, x : x + 9] += rng.uniform(100, 180)
    return np.clip(img, 0, 255)


def test_fast_matches_cv2(rng):
    img = checker_image(rng)
    thr = 20
    score = np.asarray(fast.fast_score(jnp.asarray(img), float(thr)))
    ours = set(zip(*np.nonzero(score > 0)))

    det = cv2.FastFeatureDetector_create(thr, False)  # no NMS: raw corner set
    kps = det.detect(img.astype(np.uint8), None)
    cv = set((int(kp.pt[1]), int(kp.pt[0])) for kp in kps)
    # Interior only (cv2 uses a 3px border too)
    # Allow small disagreement from float-vs-uint8 rounding at arc boundaries.
    inter = len(ours & cv)
    union = len(ours | cv)
    assert union > 20, "test image should produce corners"
    assert inter / union > 0.9, f"FAST IoU vs cv2 = {inter/union:.3f}"


def test_fast_nms_matches_cv2(rng):
    img = checker_image(rng)
    thr = 20
    score = np.asarray(nms.nms3x3(fast.fast_score(jnp.asarray(img), float(thr))))
    ours = set(zip(*np.nonzero(score > 0)))
    det = cv2.FastFeatureDetector_create(thr, True)
    kps = det.detect(img.astype(np.uint8), None)
    cv = set((int(kp.pt[1]), int(kp.pt[0])) for kp in kps)
    inter = len(ours & cv)
    assert len(cv) > 5
    # NMS tie-breaks differ slightly; require strong overlap w.r.t. cv2's set
    assert inter / len(cv) > 0.75, f"NMS recall vs cv2 = {inter/max(len(cv),1):.3f}"


def test_suppression_mask(rng):
    pos = jnp.asarray([[50.0, 40.0], [10.0, 10.0]])
    valid = jnp.asarray([True, False])
    m = np.asarray(nms.suppression_mask((100, 100), pos, valid, 10))
    assert m[40, 50] and m[30, 40] and m[50, 60]
    assert not m[40, 61] and not m[29, 50]
    assert not m[10, 10]  # invalid feature suppresses nothing


def test_bucketed_topk_spreads(rng):
    score = np.zeros((128, 128), np.float32)
    # 50 strong corners in one cell, a weak one far away
    score[10:20, 10:20] = rng.uniform(50, 100, (10, 10)).astype(np.float32)
    score[100, 100] = 1.0
    pos, s, valid = select.bucketed_topk(jnp.asarray(score), 64, 4, 16)
    pos, s, valid = np.asarray(pos), np.asarray(s), np.asarray(valid)
    assert valid.sum() == 5  # 4 from the crowded cell + the lone corner
    got = set(map(tuple, pos[valid].astype(int)))
    assert (100, 100) in got
    in_cell = sum(1 for x, y in got if x < 64 and y < 64)
    assert in_cell == 4


def test_detect_fast_end_to_end(rng):
    img = checker_image(rng, 128, 192)
    cfg = Config(use_orb=False, image_height=128, image_width=192)
    prev_pos = jnp.zeros((8, 2), jnp.float32)
    prev_valid = jnp.zeros((8,), bool)
    pos, score, valid = detect.detect(jnp.asarray(img), prev_pos, prev_valid, cfg)
    pos, valid = np.asarray(pos), np.asarray(valid)
    assert valid.sum() > 5
    # detected positions really are FAST corners
    smap = np.asarray(fast.fast_score(jnp.asarray(img), 20.0))
    for x, y in pos[valid][:10]:
        assert smap[int(y), int(x)] > 0


def test_detect_suppresses_existing(rng):
    img = checker_image(rng, 128, 192)
    cfg = Config(use_orb=False, image_height=128, image_width=192)
    none = jnp.zeros((8, 2), jnp.float32), jnp.zeros((8,), bool)
    pos1, _, valid1 = detect.detect(jnp.asarray(img), *none, cfg)
    # feed the detections back as "previous features": nothing new nearby
    pos2, _, valid2 = detect.detect(jnp.asarray(img), pos1, valid1, cfg)
    p1 = np.asarray(pos1)[np.asarray(valid1)]
    p2 = np.asarray(pos2)[np.asarray(valid2)]
    if len(p2):
        d = np.abs(p2[:, None, :] - p1[None, :, :]).max(-1).min(1)
        assert d.min() > 10  # all clear of the 21x21 suppression rectangles


def test_detect_orb_multiscale(rng):
    img = checker_image(rng, 160, 224)
    cfg = Config(use_orb=True, image_height=160, image_width=224)
    prev_pos = jnp.zeros((8, 2), jnp.float32)
    prev_valid = jnp.zeros((8,), bool)
    pos, score, valid = detect.detect(jnp.asarray(img), prev_pos, prev_valid, cfg)
    pos, valid = np.asarray(pos), np.asarray(valid)
    assert valid.sum() > 5
    assert (pos[valid, 0] < 224).all() and (pos[valid, 1] < 160).all()
    assert (pos[valid] >= 0).all()
