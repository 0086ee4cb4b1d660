"""Segmentation vs cv2 Otsu + behavioral mask checks (SURVEY.md §2.1 #5)."""

import numpy as np
import cv2
import jax.numpy as jnp
import pytest

from kalman_hydra_tpu.ops import segment as seg


def test_otsu_matches_cv2(rng):
    # bimodal image: dark background + bright blob
    img = rng.normal(60, 10, (128, 128)).astype(np.float32)
    img[40:90, 30:80] = rng.normal(180, 12, (50, 50))
    img = np.clip(img, 0, 255)
    t_cv, _ = cv2.threshold(img.astype(np.uint8), 0, 255,
                            cv2.THRESH_BINARY | cv2.THRESH_OTSU)
    t_j = float(seg.otsu_threshold(jnp.asarray(img)))
    assert abs(t_j - t_cv) <= 1.0


def test_segment_blob_clip(blob_clip):
    frames, truth = blob_clip
    gray = cv2.cvtColor(frames[0], cv2.COLOR_BGR2GRAY).astype(np.float32)
    mask = np.asarray(seg.segment_body(jnp.asarray(gray)))
    assert set(np.unique(mask)).issubset({0.0, 1.0})
    # the blob (bright plateau) must be mostly inside the mask
    c = truth.positions[0].mean(axis=0)
    yy, xx = np.mgrid[0:gray.shape[0], 0:gray.shape[1]]
    inside = (xx - c[0]) ** 2 + (yy - c[1]) ** 2 < 10 ** 2
    assert mask[inside].mean() > 0.9
    # and the mask shouldn't cover most of the background
    assert mask.mean() < 0.5


def test_morphology_removes_speckle():
    m = np.zeros((64, 64), np.float32)
    m[20:40, 20:40] = 1.0          # solid block
    m[5, 5] = 1.0                  # speckle
    opened = np.asarray(seg.morph_open(jnp.asarray(m), 5))
    assert opened[5, 5] == 0.0
    assert opened[25:35, 25:35].min() == 1.0


def test_mask_scores_zeroes_outside():
    score = jnp.ones((8, 8))
    mask = jnp.zeros((8, 8)).at[2:4, 2:4].set(1.0)
    out = np.asarray(seg.mask_scores(score, mask))
    assert out.sum() == 4.0


def test_segment_inverted_polarity(rng):
    """Dark body on bright background (invert=True)."""
    img = rng.normal(190, 10, (96, 96)).astype(np.float32)
    img[30:70, 25:65] = rng.normal(70, 10, (40, 40))
    img = np.clip(img, 0, 255)
    mask = np.asarray(seg.segment_body(jnp.asarray(img), invert=True))
    assert mask[40:60, 35:55].mean() > 0.9
    assert mask.mean() < 0.5
