"""Lucas-Kanade flow vs cv2.calcOpticalFlowPyrLK and analytic truth
(SURVEY.md §4.1; BASELINE.json:7 config-1 flow)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kalman_hydra_tpu.config import FlowConfig
from kalman_hydra_tpu.ops import lk as L
from kalman_hydra_tpu.ref import imgproc as ip


@pytest.fixture(scope="module")
def pair128():
    from kalman_hydra_tpu.io.synthetic import translating_pair
    return translating_pair(height=128, width=128, shift=(3.0, -2.0), seed=0)


def test_lk_sparse_matches_cv2(pair128):
    a, b, _ = pair128
    cfg = FlowConfig(levels=3)
    pts = np.stack(np.meshgrid(np.arange(24, 105, 16),
                               np.arange(24, 105, 16)), -1)
    pts = pts.reshape(-1, 2).astype(np.float32)
    ref_pts, ref_st = ip.lk_sparse(a, b, pts, cfg)
    got_pts, got_st = L.lk_sparse(jnp.asarray(a), jnp.asarray(b),
                                  jnp.asarray(pts), cfg)
    got_pts, got_st = np.asarray(got_pts), np.asarray(got_st)
    assert (ref_st.astype(bool) == got_st).mean() > 0.95
    m = ref_st.astype(bool) & got_st
    assert np.abs(got_pts[m] - ref_pts[m]).max() < 0.02


def test_lk_sparse_tracks_truth(pair128):
    a, b, flow_true = pair128
    cfg = FlowConfig(levels=3)
    pts = np.array([[30.0, 30.0], [64.0, 64.0], [90.0, 40.0]], np.float32)
    got_pts, st = L.lk_sparse(jnp.asarray(a), jnp.asarray(b),
                              jnp.asarray(pts), cfg)
    assert np.asarray(st).all()
    disp = np.asarray(got_pts) - pts
    assert np.abs(disp - flow_true[0, 0]).max() < 0.05


def test_lk_dense_epe_vs_truth(pair128):
    a, b, flow_true = pair128
    cfg = FlowConfig(levels=3)
    fl = np.asarray(jax.jit(lambda x, y: L.lk_dense(x, y, cfg))(
        jnp.asarray(a), jnp.asarray(b)))
    epe = np.linalg.norm(fl - flow_true, axis=-1)[12:-12, 12:-12]
    assert epe.mean() < 0.05          # well under the 0.5px contract
    assert np.percentile(epe, 95) < 0.2


def test_lk_dense_agrees_with_sparse_at_points(pair128):
    a, b, _ = pair128
    cfg = FlowConfig(levels=3)
    fl = np.asarray(jax.jit(lambda x, y: L.lk_dense(x, y, cfg))(
        jnp.asarray(a), jnp.asarray(b)))
    pts = np.stack(np.meshgrid(np.arange(24, 105, 16),
                               np.arange(24, 105, 16)), -1)
    pts = pts.reshape(-1, 2).astype(np.float32)
    ref_pts, ref_st = ip.lk_sparse(a, b, pts, cfg)
    disp_ref = ref_pts - pts
    ix = pts.astype(int)
    disp_dense = fl[ix[:, 1], ix[:, 0]]
    m = ref_st.astype(bool)
    assert np.abs(disp_dense[m] - disp_ref[m]).mean() < 0.05


def test_lk_dense_subpixel_shift():
    from kalman_hydra_tpu.io.synthetic import translating_pair
    a, b, flow_true = translating_pair(height=64, width=64,
                                       shift=(0.6, -0.4), seed=1)
    cfg = FlowConfig(levels=1)
    fl = np.asarray(jax.jit(lambda x, y: L.lk_dense(x, y, cfg))(
        jnp.asarray(a), jnp.asarray(b)))
    epe = np.linalg.norm(fl - flow_true, axis=-1)[8:-8, 8:-8]
    assert epe.mean() < 0.05


def test_lk_dense_fast_warp_matches_exact(pair128):
    a, b, _ = pair128
    exact = np.asarray(jax.jit(lambda x, y: L.lk_dense(
        x, y, FlowConfig(levels=3)))(jnp.asarray(a), jnp.asarray(b)))
    fast = np.asarray(jax.jit(lambda x, y: L.lk_dense(
        x, y, FlowConfig(levels=3, fast_warp=8)))(jnp.asarray(a),
                                                  jnp.asarray(b)))
    epe = np.linalg.norm(exact - fast, axis=-1)
    assert epe[8:-8, 8:-8].mean() < 0.02


def test_lk_sparse_block_halo_matches_exact(pair128):
    """lk_block_halo > 0 (batched block extraction + gather-free in-block
    iterations) must match the exact per-iteration-slice path when the
    per-level displacement fits the halo."""
    a, b, _ = pair128
    pts = np.stack(np.meshgrid(np.arange(24, 105, 16),
                               np.arange(24, 105, 16)), -1)
    pts = pts.reshape(-1, 2).astype(np.float32)
    exact_pts, exact_st = L.lk_sparse(jnp.asarray(a), jnp.asarray(b),
                                      jnp.asarray(pts), FlowConfig(levels=3))
    fast_pts, fast_st = L.lk_sparse(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(pts),
        FlowConfig(levels=3, lk_block_halo=8))
    np.testing.assert_array_equal(np.asarray(exact_st), np.asarray(fast_st))
    m = np.asarray(exact_st)
    assert np.abs(np.asarray(fast_pts)[m]
                  - np.asarray(exact_pts)[m]).max() < 0.02


def test_lk_sparse_block_halo_matches_cv2(pair128):
    a, b, _ = pair128
    cfg = FlowConfig(levels=3, lk_block_halo=8)
    pts = np.stack(np.meshgrid(np.arange(24, 105, 16),
                               np.arange(24, 105, 16)), -1)
    pts = pts.reshape(-1, 2).astype(np.float32)
    ref_pts, ref_st = ip.lk_sparse(a, b, pts, FlowConfig(levels=3))
    got_pts, got_st = L.lk_sparse(jnp.asarray(a), jnp.asarray(b),
                                  jnp.asarray(pts), cfg)
    got_pts, got_st = np.asarray(got_pts), np.asarray(got_st)
    assert (ref_st.astype(bool) == got_st).mean() > 0.95
    m = ref_st.astype(bool) & got_st
    assert np.abs(got_pts[m] - ref_pts[m]).max() < 0.05


@pytest.mark.parametrize("solver", ["corr", "corr_conv"])
def test_lk_sparse_corr_solver_matches_blockhalo(pair128, solver):
    """The correlation-table solver is the SAME math as the block-halo
    select-sum path (b(o) is bilinear in the block, so all integer-offset
    correlations are precomputed and each iteration is a table lookup):
    results must agree to float-reassociation noise, for both table
    builders (static slice-reduces and the depthwise conv)."""
    a, b, _ = pair128
    pts = np.stack(np.meshgrid(np.arange(24, 105, 16),
                               np.arange(24, 105, 16)), -1)
    pts = pts.reshape(-1, 2).astype(np.float32)
    base_pts, base_st = L.lk_sparse(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(pts),
        FlowConfig(levels=3, lk_block_halo=8))
    got_pts, got_st = L.lk_sparse(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(pts),
        FlowConfig(levels=3, lk_block_halo=8, lk_solver=solver))
    np.testing.assert_array_equal(np.asarray(base_st), np.asarray(got_st))
    m = np.asarray(base_st)
    assert np.abs(np.asarray(got_pts)[m]
                  - np.asarray(base_pts)[m]).max() < 5e-3


def test_lk_sparse_corr_solver_matches_cv2(pair128):
    a, b, _ = pair128
    cfg = FlowConfig(levels=3, lk_block_halo=8, lk_solver="corr")
    pts = np.stack(np.meshgrid(np.arange(24, 105, 16),
                               np.arange(24, 105, 16)), -1)
    pts = pts.reshape(-1, 2).astype(np.float32)
    ref_pts, ref_st = ip.lk_sparse(a, b, pts, FlowConfig(levels=3))
    got_pts, got_st = L.lk_sparse(jnp.asarray(a), jnp.asarray(b),
                                  jnp.asarray(pts), cfg)
    got_pts, got_st = np.asarray(got_pts), np.asarray(got_st)
    assert (ref_st.astype(bool) == got_st).mean() > 0.95
    m = ref_st.astype(bool) & got_st
    assert np.abs(got_pts[m] - ref_pts[m]).max() < 0.05


def test_lk_sparse_block_halo_tiny_levels_fall_back(rng):
    """Regression: coarse levels smaller than the halo'd block made the
    base clip invalid (min > max) and produced garbage — they must take
    the per-point path and agree with the halo=0 reference."""
    from kalman_hydra_tpu.io.synthetic import translating_pair
    a, b, _ = translating_pair(height=128, width=128, shift=(2.0, -1.5),
                               seed=1)
    pts = np.stack(np.meshgrid(np.arange(30, 99, 16),
                               np.arange(30, 99, 16)), -1)
    pts = pts.reshape(-1, 2).astype(np.float32)
    # levels=5 on 128 px: level 4 is 8 px < Bb = 22 + 16 = 38
    cfg_exact = FlowConfig(levels=5, lk_block_halo=0)
    cfg_batch = FlowConfig(levels=5, lk_block_halo=8)
    rp, rs = L.lk_sparse(jnp.asarray(a), jnp.asarray(b), jnp.asarray(pts),
                         cfg_exact)
    gp, gs = L.lk_sparse(jnp.asarray(a), jnp.asarray(b), jnp.asarray(pts),
                         cfg_batch)
    m = np.asarray(rs) & np.asarray(gs)
    assert m.any()
    assert np.abs(np.asarray(gp)[m] - np.asarray(rp)[m]).max() < 0.05


def test_blocked_gather_matches_plain_for_any_bases(rng):
    """The blocked two-block gather must reproduce the plain K-last
    gather's per-element edge-replication clamp for ARBITRARY bases,
    including far out-of-range ones (regression: it used to clamp only
    the block base, returning zero-padded patches past the right edge)."""
    from kalman_hydra_tpu.ops.lk import (_gather_blocks_klast,
                                         _gather_blocks_klast_blocked)
    C, H, W, size, K = 3, 60, 300, 13, 40
    imgs = jnp.asarray(rng.uniform(0, 255, (C, H, W)).astype(np.float32))
    by = jnp.asarray(rng.integers(-20, H + 20, K))
    bx = jnp.asarray(np.concatenate(
        [rng.integers(-20, W + 20, K - 4),
         [-4, 0, W - size, W + 5]]).astype(np.int32))
    a = _gather_blocks_klast(imgs, by, bx, size)
    b = _gather_blocks_klast_blocked(imgs, by, bx, size)
    assert float(jnp.abs(a - b).max()) == 0.0
