"""Pallas-vs-XLA equivalence (SURVEY.md §4.2): every Pallas kernel against
its jnp twin on the same inputs, in interpret mode on CPU — isolates
kernel bugs from numerics-policy differences."""

import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from kalman_hydra_tpu.config import EkfConfig
from kalman_hydra_tpu.kernels.ekf_pallas import ekf_fused_step
from kalman_hydra_tpu.kernels.flow_update_pallas import flow_update
from kalman_hydra_tpu.kernels.polyexp_pallas import poly_expansion_planar
from kalman_hydra_tpu.kernels.pyramid_pallas import pyr_down as pyr_down_pl
from kalman_hydra_tpu.models import dynamics as dyn
from kalman_hydra_tpu.models import ekf as jekf
from kalman_hydra_tpu.ops import farneback as FB


@pytest.mark.parametrize("shape", [(64, 96), (37, 53), (257, 129)])
def test_pyr_down_kernel_matches_cv2(shape, rng):
    img = rng.uniform(0, 255, shape).astype(np.float32)
    ref = cv2.pyrDown(img)
    got = np.asarray(pyr_down_pl(jnp.asarray(img), interpret=True))
    assert got.shape == ref.shape
    assert np.abs(ref - got).max() < 1e-3


@pytest.mark.parametrize("pn,ps", [(5, 1.1), (7, 1.5)])
def test_polyexp_kernel_matches_xla(pn, ps, rng):
    img = rng.uniform(0, 255, (100, 130)).astype(np.float32)
    ref = np.asarray(FB.poly_expansion(jnp.asarray(img), pn, ps))
    got = np.asarray(poly_expansion_planar(jnp.asarray(img), pn, ps,
                                           interpret=True))
    assert np.abs(ref - np.moveaxis(got, 0, -1)).max() < 1e-3


@pytest.mark.parametrize("gaussian", [False, True])
def test_flow_update_kernel_matches_xla(gaussian, rng):
    h, w = 96, 128
    a = rng.uniform(0, 255, (h, w)).astype(np.float32)
    b = rng.uniform(0, 255, (h, w)).astype(np.float32)
    R0 = FB.poly_expansion(jnp.asarray(a), 5, 1.1)
    R1 = FB.poly_expansion(jnp.asarray(b), 5, 1.1)
    flow = jnp.asarray(rng.uniform(-2, 2, (h, w, 2)).astype(np.float32))
    R1w = FB._warp_poly(R1, flow)
    M = FB.update_matrices(R0, R1, flow)
    ref = np.asarray(FB.update_flow(M, 15, gaussian))
    got = np.asarray(flow_update(
        jnp.moveaxis(R0, -1, 0), jnp.moveaxis(R1w, -1, 0),
        jnp.moveaxis(flow, -1, 0), 15, gaussian, interpret=True))
    assert np.abs(ref - np.moveaxis(got, 0, -1)).max() < 1e-4


@pytest.mark.parametrize("state_dim", [4, 6])
def test_ekf_kernel_matches_xla(state_dim, rng):
    cfg = EkfConfig(state_dim=state_dim)
    K, n = 200, state_dim
    F = dyn.transition(cfg)
    Q = dyn.process_noise(cfg)
    H = dyn.position_H(cfg)
    R = (cfg.r * np.eye(2)).astype(np.float32)
    x = rng.normal(size=(K, n)).astype(np.float32)
    P = np.broadcast_to(np.eye(n, dtype=np.float32) * 3, (K, n, n)).copy()
    z = rng.normal(size=(K, 2)).astype(np.float32) * 3

    xp, Pp = jekf.predict(jnp.asarray(x), jnp.asarray(P), jnp.asarray(F),
                          jnp.asarray(Q))
    y = jnp.asarray(z) - xp[:, 0:2]
    xr, Pr, nr = jekf.update(xp, Pp, y, jnp.asarray(H), jnp.asarray(R))
    xg, Pg, ng = ekf_fused_step(jnp.asarray(x), jnp.asarray(P), y,
                                jnp.asarray(H), F, Q, cfg.r, interpret=True)
    assert np.abs(np.asarray(xg) - np.asarray(xr)).max() < 1e-4
    assert np.abs(np.asarray(Pg) - np.asarray(Pr)).max() < 1e-4
    assert np.abs(np.asarray(ng) - np.asarray(nr)).max() < 1e-4


@pytest.mark.parametrize("win,gaussian", [(15, False), (13, False),
                                          (15, True)])
def test_flow_iter_kernel_matches_xla(win, gaussian, rng):
    """Fully fused iteration (warp + M + box + solve) vs the XLA
    fast-warp path, including the image-border M replication."""
    from kalman_hydra_tpu.kernels.flow_iter_pallas import flow_iter
    from kalman_hydra_tpu.ops import farneback as FB
    h, w = 70, 90
    R0 = jnp.asarray(rng.normal(size=(5, h, w)).astype(np.float32))
    R1 = jnp.asarray(rng.normal(size=(5, h, w)).astype(np.float32))
    fl = jnp.asarray(rng.uniform(-5, 5, (2, h, w)).astype(np.float32))
    got = flow_iter(R0, R1, fl, win, 8, gaussian, interpret=True)
    ref = FB.update_flow_p(FB.update_matrices_p(R0, R1, fl, fast_warp=8),
                           win, gaussian)
    assert float(jnp.abs(got - ref).max()) < 1e-4


@pytest.mark.parametrize("tile_h", [16, 48, 64])
def test_flow_iter_kernel_tile_heights(tile_h, rng):
    """Row-tile height is a pure perf knob — results must not change."""
    from kalman_hydra_tpu.kernels.flow_iter_pallas import flow_iter
    h, w = 70, 90
    R0 = jnp.asarray(rng.normal(size=(5, h, w)).astype(np.float32))
    R1 = jnp.asarray(rng.normal(size=(5, h, w)).astype(np.float32))
    fl = jnp.asarray(rng.uniform(-5, 5, (2, h, w)).astype(np.float32))
    ref = flow_iter(R0, R1, fl, 15, 8, False, interpret=True)
    got = flow_iter(R0, R1, fl, 15, 8, False, tile_h=tile_h, interpret=True)
    assert float(jnp.abs(got - ref).max()) < 1e-6


def test_flow_iter_kernel_shift_skip_exact(rng):
    """Tile-adaptive shift skipping must be EXACT: every skipped warp
    term is identically zero for the tile's displacement range."""
    from kalman_hydra_tpu.kernels.flow_iter_pallas import flow_iter
    h, w = 70, 90
    R0 = jnp.asarray(rng.normal(size=(5, h, w)).astype(np.float32))
    R1 = jnp.asarray(rng.normal(size=(5, h, w)).astype(np.float32))
    for fl in (jnp.asarray(rng.uniform(-5, 5, (2, h, w)).astype(np.float32)),
               jnp.broadcast_to(jnp.asarray([3.2, -1.7], jnp.float32)
                                [:, None, None], (2, h, w))):
        ref = flow_iter(R0, R1, fl, 15, 8, False, interpret=True)
        got = flow_iter(R0, R1, fl, 15, 8, False, interpret=True,
                        shift_skip=True)
        assert float(jnp.abs(got - ref).max()) < 1e-6


@pytest.mark.parametrize("n_iters,tile_h,skip,gaussian,bf16", [
    (3, 16, True, False, False),
    (3, 16, False, False, False),
    (2, 32, True, True, False),
    (3, 16, True, False, True),
])
def test_flow_iters_pipelined_matches_sequential(n_iters, tile_h, skip,
                                                 gaussian, bf16, rng):
    """The strip-mined all-iterations kernel (skewed pipeline, VMEM flow
    rings) must reproduce n sequential flow_iter launches exactly —
    including the inter-iteration crop/re-pad edge semantics and the
    bottom-band rows beyond the image height."""
    from kalman_hydra_tpu.kernels.flow_iter_pallas import (
        flow_iter, flow_iters_pipelined, prep_planes)
    h, w = 70, 90                      # h_pad > h: bottom band has
    dt = jnp.bfloat16 if bf16 else jnp.float32   # rows past the image
    R0 = jnp.asarray(rng.normal(size=(5, h, w)).astype(np.float32)).astype(dt)
    R1 = jnp.asarray(rng.normal(size=(5, h, w)).astype(np.float32)).astype(dt)
    fl = jnp.asarray(rng.uniform(-5, 5, (2, h, w)).astype(np.float32))
    ref = fl
    for _ in range(n_iters):
        ref = flow_iter(R0, R1, ref, 15, 8, gaussian, tile_h=tile_h,
                        shift_skip=skip, interpret=True)
    R0p = prep_planes(R0, 15, 8, tile_h=tile_h)
    R1p = prep_planes(R1, 15, 8, tile_h=tile_h)
    got = flow_iters_pipelined(R0p, R1p, fl, 15, 8, n_iters,
                               img_hw=(h, w), gaussian=gaussian,
                               tile_h=tile_h, shift_skip=skip,
                               interpret=True)
    assert float(jnp.abs(got - ref).max()) < 1e-5


def test_flow_iter_kernel_band_mode(rng):
    """Band mode (row0/img_h): a mid-image slab with its global row
    offset reproduces the full-image rows in the band interior."""
    from kalman_hydra_tpu.kernels.flow_iter_pallas import flow_iter
    h, w = 96, 90
    R0 = jnp.asarray(rng.normal(size=(5, h, w)).astype(np.float32))
    R1 = jnp.asarray(rng.normal(size=(5, h, w)).astype(np.float32))
    fl = jnp.asarray(rng.uniform(-5, 5, (2, h, w)).astype(np.float32))
    full = flow_iter(R0, R1, fl, 15, 8, False, interpret=True)
    RP = 16                      # bw + D + 1 reach
    r0b, r1b = 32 - RP, 64 + RP
    band = flow_iter(R0[:, r0b:r1b], R1[:, r0b:r1b], fl[:, r0b:r1b],
                     15, 8, False, interpret=True, row0=r0b, img_h=h)
    assert float(jnp.abs(band[:, RP:-RP] - full[:, 32:64]).max()) < 1e-5


def test_flow_iter_kernel_bf16_planes(rng):
    """bf16 plane slabs (half the DMA bytes): storage-only precision loss —
    must track the f32 kernel to bf16 rounding of the inputs."""
    from kalman_hydra_tpu.kernels.flow_iter_pallas import flow_iter
    h, w = 70, 90
    R0 = jnp.asarray(rng.normal(size=(5, h, w)).astype(np.float32))
    R1 = jnp.asarray(rng.normal(size=(5, h, w)).astype(np.float32))
    fl = jnp.asarray(rng.uniform(-5, 5, (2, h, w)).astype(np.float32))
    got = flow_iter(R0.astype(jnp.bfloat16), R1.astype(jnp.bfloat16), fl,
                    15, 8, False, interpret=True)
    # reference: same storage rounding through the XLA twin
    ref = FB.update_flow_p(
        FB.update_matrices_p(R0.astype(jnp.bfloat16),
                             R1.astype(jnp.bfloat16), fl,
                             fast_warp=8).astype(jnp.float32),
        15, False)
    assert float(jnp.abs(got - ref).max()) < 0.05


@pytest.mark.parametrize("win,gaussian,iters", [(15, False, 3),
                                                (15, True, 2),
                                                (13, False, 1)])
def test_flow_level_kernel_matches_xla(win, gaussian, iters, rng):
    """Whole-level multi-iteration kernel (coarse levels): all `iters`
    warp+M+box+solve passes in one launch must match `iters` sequential
    XLA fast-warp iterations, including the in-kernel flow-halo edge
    replication between iterations."""
    from kalman_hydra_tpu.kernels.flow_level_pallas import flow_level
    h, w = 67, 91
    R0 = jnp.asarray(rng.normal(size=(5, h, w)).astype(np.float32))
    R1 = jnp.asarray(rng.normal(size=(5, h, w)).astype(np.float32))
    fl = jnp.asarray(rng.uniform(-5, 5, (2, h, w)).astype(np.float32))
    ref = fl
    for _ in range(iters):
        ref = FB.update_flow_p(
            FB.update_matrices_p(R0, R1, ref, fast_warp=8), win, gaussian)
    got = flow_level(R0, R1, fl, win, 8, iters, gaussian=gaussian,
                     interpret=True)
    assert float(jnp.abs(got - ref).max()) < 1e-4


def test_flow_level_kernel_bf16_planes(rng):
    """bf16 plane storage through the whole-level kernel tracks the XLA
    twin with the same storage rounding."""
    from kalman_hydra_tpu.kernels.flow_level_pallas import flow_level
    h, w = 48, 80
    R0 = jnp.asarray(rng.normal(size=(5, h, w)).astype(np.float32))
    R1 = jnp.asarray(rng.normal(size=(5, h, w)).astype(np.float32))
    fl = jnp.asarray(rng.uniform(-3, 3, (2, h, w)).astype(np.float32))
    ref = fl
    for _ in range(2):
        ref = FB.update_flow_p(
            FB.update_matrices_p(R0.astype(jnp.bfloat16),
                                 R1.astype(jnp.bfloat16), ref,
                                 fast_warp=8).astype(jnp.float32),
            15, False)
    got = flow_level(R0.astype(jnp.bfloat16), R1.astype(jnp.bfloat16),
                     fl, 15, 8, 2, interpret=True)
    assert float(jnp.abs(got - ref).max()) < 0.05


@pytest.mark.parametrize("K", [600, 700])
def test_ekf_kernel_tail_tile(K, rng):
    """Padded track counts in (512, 1024) not divisible by 512 must still
    compute every lane (regression: the grid used to drop the tail tile)."""
    cfg = EkfConfig(state_dim=4)
    n = 4
    F = dyn.transition(cfg)
    Q = dyn.process_noise(cfg)
    H = dyn.position_H(cfg)
    R = (cfg.r * np.eye(2)).astype(np.float32)
    x = rng.normal(size=(K, n)).astype(np.float32)
    P = np.broadcast_to(np.eye(n, dtype=np.float32) * 3, (K, n, n)).copy()
    z = rng.normal(size=(K, 2)).astype(np.float32) * 3

    xp, Pp = jekf.predict(jnp.asarray(x), jnp.asarray(P), jnp.asarray(F),
                          jnp.asarray(Q))
    y = jnp.asarray(z) - xp[:, 0:2]
    xr, Pr, nr = jekf.update(xp, Pp, y, jnp.asarray(H), jnp.asarray(R))
    xg, Pg, ng = ekf_fused_step(jnp.asarray(x), jnp.asarray(P), y,
                                jnp.asarray(H), F, Q, cfg.r, interpret=True)
    # the old bug left the tail lanes unwritten — compare the FULL batch
    assert np.abs(np.asarray(xg) - np.asarray(xr)).max() < 1e-4
    assert np.abs(np.asarray(Pg) - np.asarray(Pr)).max() < 1e-4
    assert np.abs(np.asarray(ng) - np.asarray(nr)).max() < 1e-4


def test_ekf_kernel_per_track_H(rng):
    """Implicit-flow EKF uses a per-track H — kernel must handle (K,2,n)."""
    cfg = EkfConfig(state_dim=4)
    K, n = 130, 4
    F = dyn.transition(cfg)
    Q = dyn.process_noise(cfg)
    R = (cfg.r * np.eye(2)).astype(np.float32)
    x = rng.normal(size=(K, n)).astype(np.float32)
    P = np.broadcast_to(np.eye(n, dtype=np.float32) * 2, (K, n, n)).copy()
    H = rng.normal(size=(K, 2, n)).astype(np.float32) * 0.3
    H[:, 0, 0] += 1.0
    H[:, 1, 1] += 1.0
    y = rng.normal(size=(K, 2)).astype(np.float32)

    xp, Pp = jekf.predict(jnp.asarray(x), jnp.asarray(P), jnp.asarray(F),
                          jnp.asarray(Q))
    xr, Pr, nr = jekf.update(xp, Pp, jnp.asarray(y), jnp.asarray(H),
                             jnp.asarray(R))
    xg, Pg, ng = ekf_fused_step(jnp.asarray(x), jnp.asarray(P),
                                jnp.asarray(y), jnp.asarray(H), F, Q, cfg.r,
                                interpret=True)
    assert np.abs(np.asarray(xg) - np.asarray(xr)).max() < 1e-4
    assert np.abs(np.asarray(ng) - np.asarray(nr)).max() < 2e-4


def test_farneback_pallas_impl_matches_xla():
    from kalman_hydra_tpu.config import FlowConfig
    from kalman_hydra_tpu.io.synthetic import translating_pair
    a, b, _ = translating_pair(height=96, width=96, shift=(2.0, -1.0))
    cfg = FlowConfig(levels=2)
    ref = np.asarray(FB.farneback(jnp.asarray(a), jnp.asarray(b), cfg))
    got = np.asarray(FB.farneback(jnp.asarray(a), jnp.asarray(b), cfg,
                                  impl="pallas", interpret=True))
    assert np.abs(ref - got).max() < 1e-3


@pytest.mark.parametrize("shape", [(64, 96), (37, 53), (270, 480)])
def test_scharr_kernel_matches_xla(shape, rng):
    from kalman_hydra_tpu.kernels.scharr_pallas import (
        scharr_gradients as sg_pl)
    from kalman_hydra_tpu.ops.lk import scharr_gradients as sg_xla
    img = jnp.asarray(rng.uniform(0, 255, shape).astype(np.float32))
    rx, ry = sg_xla(img)
    gx, gy = sg_pl(img, interpret=True)
    assert float(jnp.abs(gx - rx).max()) < 1e-3
    assert float(jnp.abs(gy - ry).max()) < 1e-3


def test_lk_pyramid_pallas_matches_xla(rng):
    """impl='pallas' pyramid front-end (MXU pyr_down + fused Scharr) must
    track the XLA lk_pyramid at every level."""
    from kalman_hydra_tpu.config import FlowConfig
    from kalman_hydra_tpu.ops import lk as L
    img = jnp.asarray(rng.uniform(0, 255, (96, 128)).astype(np.float32))
    cfg = FlowConfig(levels=3)
    pyr_x, grads_x = L.lk_pyramid(img, cfg)
    pyr_p, grads_p = L.lk_pyramid(img, cfg, impl="pallas", interpret=True)
    for a, b in zip(pyr_x, pyr_p):
        assert float(jnp.abs(a - b).max()) < 1e-3
    for (gxa, gya), (gxb, gyb) in zip(grads_x, grads_p):
        assert float(jnp.abs(gxa - gxb).max()) < 1e-3
        assert float(jnp.abs(gya - gyb).max()) < 1e-3


def test_farneback_pallas_bf16_matches_xla():
    """bf16_poly + impl=pallas: the cached bf16 polyexp pyramids feed the
    fused iteration kernel directly (no f32 upcast) — must track the XLA
    bf16 path within storage-rounding noise."""
    from kalman_hydra_tpu.config import FlowConfig
    from kalman_hydra_tpu.io.synthetic import translating_pair
    a, b, _ = translating_pair(height=96, width=96, shift=(2.0, -1.0))
    cfg = FlowConfig(levels=2, bf16_poly=True, fast_warp=8)
    ref = np.asarray(FB.farneback(jnp.asarray(a), jnp.asarray(b), cfg))
    got = np.asarray(FB.farneback(jnp.asarray(a), jnp.asarray(b), cfg,
                                  impl="pallas", interpret=True))
    assert np.abs(ref - got).max() < 0.05


def test_lk_sparse_kernel_matches_xla():
    from kalman_hydra_tpu.config import FlowConfig
    from kalman_hydra_tpu.io.synthetic import translating_pair
    from kalman_hydra_tpu.kernels import lk_pallas as LP
    from kalman_hydra_tpu.ops import lk as L
    a, b, _ = translating_pair(height=96, width=96, shift=(2.0, -1.5),
                               seed=0)
    cfg = FlowConfig(levels=3)
    pts = np.stack(np.meshgrid(np.arange(24, 73, 12),
                               np.arange(24, 73, 12)), -1)
    pts = pts.reshape(-1, 2).astype(np.float32)
    ref_pts, ref_st = L.lk_sparse(jnp.asarray(a), jnp.asarray(b),
                                  jnp.asarray(pts), cfg)
    got_pts, got_st = LP.lk_sparse(jnp.asarray(a), jnp.asarray(b),
                                   jnp.asarray(pts), cfg, interpret=True)
    assert (np.asarray(ref_st) == np.asarray(got_st)).all()
    m = np.asarray(ref_st) & np.asarray(got_st)
    assert np.abs(np.asarray(got_pts)[m] - np.asarray(ref_pts)[m]).max() < 1e-3


def test_coarse_polyexp_fused_matches_per_stage():
    """The fused coarse-level blur+resize+polyexp kernel (one launch, no
    level-image HBM round trip, replicate padding baked into the band
    matrices) must match the XLA farneback_images + poly_expansion_p
    per-stage reference for every coarse level."""
    from kalman_hydra_tpu.config import FlowConfig
    from kalman_hydra_tpu.io.synthetic import translating_pair
    from kalman_hydra_tpu.kernels.level_image_pallas import (
        coarse_polyexp_fused)
    from kalman_hydra_tpu.ops.pyramid import farneback_images
    a, _, _ = translating_pair(height=150, width=200)
    cfg = FlowConfig(levels=3)
    fused = coarse_polyexp_fused(jnp.asarray(a), cfg.levels, cfg.pyr_scale,
                                 cfg.poly_n, cfg.poly_sigma, interpret=True)
    imgs = farneback_images(jnp.asarray(a, jnp.float32), cfg.levels,
                            cfg.pyr_scale)
    # fused covers the coarse entries (all but the last/full-res level)
    assert len(fused) == len(imgs) - 1
    for f, img in zip(fused, imgs[:-1]):
        ref = FB.poly_expansion_p(img, cfg.poly_n, cfg.poly_sigma)
        assert float(jnp.abs(f - ref).max()) < 1e-3


def test_farneback_pallas_bf16_exact_warp_matches_xla():
    """Regression: bf16_poly + impl=pallas + fast_warp=0 crashed (bf16
    planes fed the f32-only flow_update kernel); the exact-parity path
    must upcast and run."""
    from kalman_hydra_tpu.config import FlowConfig
    from kalman_hydra_tpu.io.synthetic import translating_pair
    a, b, _ = translating_pair(height=96, width=96, shift=(2.0, -1.0))
    cfg = FlowConfig(levels=2, bf16_poly=True, fast_warp=0)
    ref = np.asarray(FB.farneback(jnp.asarray(a), jnp.asarray(b), cfg))
    got = np.asarray(FB.farneback(jnp.asarray(a), jnp.asarray(b), cfg,
                                  impl="pallas", interpret=True))
    assert np.abs(ref - got).max() < 0.05


def test_lk_sparse_kernel_border_points():
    """Points hugging the image border exercise the aligned-DMA base
    clamps and the fraction-stays-in-[0,1) invariant of the hardware
    kernel redesign — must track the XLA path there too."""
    from kalman_hydra_tpu.config import FlowConfig
    from kalman_hydra_tpu.io.synthetic import translating_pair
    from kalman_hydra_tpu.kernels import lk_pallas as LP
    from kalman_hydra_tpu.ops import lk as L
    a, b, _ = translating_pair(height=96, width=96, shift=(2.0, -1.5),
                               seed=2)
    pts = np.array([[1.0, 1.0], [94.0, 1.0], [1.0, 94.0], [94.0, 94.0],
                    [0.0, 48.0], [95.0, 48.0], [48.0, 0.3], [47.7, 95.0],
                    [48.0, 48.0]], np.float32)
    cfg = FlowConfig(levels=2)
    rp, rs = L.lk_sparse(jnp.asarray(a), jnp.asarray(b), jnp.asarray(pts),
                         cfg)
    gp, gs = LP.lk_sparse(jnp.asarray(a), jnp.asarray(b), jnp.asarray(pts),
                          cfg, interpret=True)
    assert (np.asarray(rs) == np.asarray(gs)).all()
    m = np.asarray(rs) & np.asarray(gs)
    if m.any():
        assert np.abs(np.asarray(gp)[m] - np.asarray(rp)[m]).max() < 0.05


@pytest.mark.parametrize("shape,levels,scale",
                         [((96, 128), 3, 0.5), ((37, 53), 2, 0.5),
                          ((128, 128), 4, 0.5),  # levels_eff clamps to 2
                          ((128, 96), 3, 0.75),   # non-dyadic pyr_scale
                          ((100, 100), 2, 0.6)])
def test_level_images_kernel_matches_xla(shape, levels, scale, rng):
    """Fused blur+resize band-matrix kernel vs the XLA farneback_images
    twin, every level — incl. non-dyadic pyr_scale (cvRound sizes)."""
    from kalman_hydra_tpu.kernels.level_image_pallas import (
        farneback_images_pallas)
    from kalman_hydra_tpu.ops.pyramid import farneback_images
    img = jnp.asarray(rng.uniform(0, 255, shape).astype(np.float32))
    ref = farneback_images(img, levels, scale)
    got = farneback_images_pallas(img, levels, scale, interpret=True)
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        assert a.shape == b.shape
        assert float(jnp.abs(a - b).max()) < 1e-2
