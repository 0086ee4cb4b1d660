"""XLA filter/pyramid/color/feature ops vs the OpenCV oracle
(SURVEY.md §4.1: every op vs the corresponding cv2 call)."""

import numpy as np
import cv2
import jax.numpy as jnp
import pytest

from kalman_hydra_tpu.ops import color as C
from kalman_hydra_tpu.ops import features as feat
from kalman_hydra_tpu.ops import filters as F
from kalman_hydra_tpu.ops import pyramid as P
from kalman_hydra_tpu.ops import warp as W


@pytest.fixture()
def img(rng):
    return rng.uniform(0, 255, (37, 53)).astype(np.float32)


@pytest.mark.parametrize("ksize,sigma", [(3, 0.0), (5, 1.1), (9, 2.0),
                                         (19, 3.5), (79, 15.5)])
def test_gaussian_blur_matches_cv2(img, ksize, sigma):
    ref = cv2.GaussianBlur(img, (ksize, ksize), sigma,
                           borderType=cv2.BORDER_REFLECT_101)
    got = np.asarray(F.gaussian_blur(jnp.asarray(img), ksize, sigma))
    assert np.abs(ref - got).max() < 1e-3


def test_pyr_down_matches_cv2(img):
    ref = cv2.pyrDown(img)
    got = np.asarray(P.pyr_down(jnp.asarray(img)))
    assert ref.shape == got.shape
    assert np.abs(ref - got).max() < 1e-3


@pytest.mark.parametrize("oh,ow", [(19, 27), (74, 106), (37, 53), (18, 26)])
def test_resize_linear_matches_cv2(img, oh, ow):
    ref = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(P.resize_linear(jnp.asarray(img), oh, ow))
    assert np.abs(ref - got).max() < 5e-3


def test_box_blur_matches_cv2(img):
    ref = cv2.blur(img, (15, 15), borderType=cv2.BORDER_REPLICATE)
    got = np.asarray(F.box_blur2d(jnp.asarray(img), 15))
    assert np.abs(ref - got).max() < 1e-3


def test_grayscale_u8_bit_exact(rng):
    bgr = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    ref = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY).astype(np.float32)
    got = np.asarray(C.grayscale_u8(jnp.asarray(bgr)))
    assert np.array_equal(ref, got)


def test_grayscale_u8_float_color_not_truncated(rng):
    """Regression: float color frames took the int32 fixed-point path,
    so a [0, 1]-normalized clip silently became all-black. They must
    route through cv2's float cvtColor weights instead."""
    bgr = rng.uniform(0.0, 1.0, (16, 16, 3)).astype(np.float32)
    ref = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    got = np.asarray(C.grayscale_u8(jnp.asarray(bgr)))
    assert got.max() > 0.05
    assert np.abs(ref - got).max() < 1e-5


def test_min_eig_response_matches_cv2(rng):
    g8 = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    ref = cv2.cornerMinEigenVal(g8, 3, 3)
    got = np.asarray(feat.min_eig_response(jnp.asarray(g8.astype(np.float32)), 3))
    assert np.abs(ref - got).max() < 1e-5


def test_corner_pool_finds_real_corners(blob_clip):
    from kalman_hydra_tpu.config import TrackConfig
    frames, _ = blob_clip
    gray = cv2.cvtColor(frames[0], cv2.COLOR_BGR2GRAY).astype(np.float32)
    cfg = TrackConfig(corner_pool=64)
    pts, score = feat.corner_pool(jnp.asarray(gray), cfg)
    pts, score = np.asarray(pts), np.asarray(score)
    valid = score > 0
    assert valid.sum() >= 16
    # every selected point has corner response near a true local response
    resp = np.asarray(feat.min_eig_response(jnp.asarray(gray), cfg.corner_block))
    thresh = resp.max() * cfg.quality_level
    for x, y in pts[valid][:20]:
        assert resp[int(y), int(x)] >= thresh
    # spacing: tile suppression guarantees >= 1 tile separation for points
    # in different tiles; check no exact duplicates
    assert len(np.unique(pts[valid], axis=0)) == valid.sum()


def test_warp_identity(img):
    flow = jnp.zeros(img.shape + (2,), jnp.float32)
    got = np.asarray(W.warp_image(jnp.asarray(img), flow))
    assert np.abs(got - img).max() == 0


def test_warp_integer_shift(img):
    flow = jnp.ones(img.shape + (2,), jnp.float32)
    flow = flow.at[..., 1].set(0.0)  # shift x by +1
    got = np.asarray(W.warp_image(jnp.asarray(img), flow))
    assert np.abs(got[:, :-1] - img[:, 1:]).max() == 0


def test_sample_flow_matches_oracle(rng):
    from kalman_hydra_tpu.ref import imgproc as ip
    flow = rng.normal(size=(32, 48, 2)).astype(np.float32)
    pts = np.stack([rng.uniform(0, 47, 20), rng.uniform(0, 31, 20)],
                   axis=-1).astype(np.float32)
    ref = ip.sample_flow(flow, pts)
    got = np.asarray(W.sample_flow(jnp.asarray(flow), jnp.asarray(pts)))
    assert np.abs(ref - got).max() < 1e-5


def test_sample_flow_grad_matches_finite_difference(rng):
    # smooth analytic flow field: f(x, y) = [sin(x/10), cos(y/12)]
    ys, xs = np.mgrid[0:64, 0:64].astype(np.float32)
    flow = np.stack([np.sin(xs / 10.0), np.cos(ys / 12.0)], axis=-1)
    pts = np.array([[20.0, 30.0], [40.0, 10.0]], np.float32)
    vals, jac = W.sample_flow_with_grad(jnp.asarray(flow), jnp.asarray(pts))
    jac = np.asarray(jac)
    # d f0 / dx = cos(x/10)/10 ; d f1 / dy = -sin(y/12)/12
    for i, (x, y) in enumerate(pts):
        assert abs(jac[i, 0, 0] - np.cos(x / 10) / 10) < 2e-3
        assert abs(jac[i, 1, 1] + np.sin(y / 12) / 12) < 2e-3
        assert abs(jac[i, 0, 1]) < 1e-3
        assert abs(jac[i, 1, 0]) < 1e-3
