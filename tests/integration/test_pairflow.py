"""Pair-batched pipeline (RunConfig.pair_batch) parity vs the per-frame
scan: the batched kernels (flow_iter_pairs, poly_expansion_planar_batch,
coarse_polyexp_fused_batch) must reproduce the single-pair path per pair,
and track_arrays_pairflow must reproduce track_arrays trajectories.

Launch amortization is a TPU-side property (BASELINE.md round-3
session-3); these tests pin the semantics on the CPU backend (XLA path
exactly, Pallas path in interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kalman_hydra_tpu.config import (EkfConfig, FlowConfig, RunConfig,
                                     SmoothConfig, TrackConfig)
from kalman_hydra_tpu.io.synthetic import moving_blob_clip
from kalman_hydra_tpu import pipeline as pl


def _clip(t=6, h=96, w=128):
    frames, _ = moving_blob_clip(num_frames=t, height=h, width=w,
                                 num_points=6, seed=3)
    return frames


def _grays(frames):
    from kalman_hydra_tpu.ops.color import grayscale_u8
    return grayscale_u8(jnp.asarray(frames))


FB = FlowConfig(method="farneback", levels=3, winsize=9, iterations=2,
                poly_n=5, poly_sigma=1.1)


class TestBatchedKernels:
    def test_polyexp_batch_matches_single(self):
        from kalman_hydra_tpu.kernels.polyexp_pallas import (
            poly_expansion_planar, poly_expansion_planar_batch)
        grays = _grays(_clip(t=3))
        one = jnp.stack([poly_expansion_planar(g, 5, 1.1, interpret=True)
                         for g in grays])
        bat = poly_expansion_planar_batch(grays, 5, 1.1, interpret=True)
        # identical math; XLA:CPU fuses the two programs' FMAs differently
        # (coefficients are O(1e2), so 1e-3 abs ~ 1e-5 relative)
        np.testing.assert_allclose(np.asarray(bat), np.asarray(one),
                                   atol=1e-3)

    def test_coarse_fused_batch_matches_single(self):
        from kalman_hydra_tpu.kernels.level_image_pallas import (
            coarse_polyexp_fused, coarse_polyexp_fused_batch)
        grays = _grays(_clip(t=3))
        bat = coarse_polyexp_fused_batch(grays, 3, 0.5, 5, 1.1,
                                         interpret=True)
        for n in range(grays.shape[0]):
            one = coarse_polyexp_fused(grays[n], 3, 0.5, 5, 1.1,
                                       interpret=True)
            for lvl, o in enumerate(one):
                np.testing.assert_allclose(np.asarray(bat[lvl][n]),
                                           np.asarray(o), atol=1e-3)

    @pytest.mark.parametrize("shift_skip", [False, True])
    def test_flow_iter_pairs_matches_flow_iter(self, shift_skip, rng):
        from kalman_hydra_tpu.kernels.flow_iter_pallas import (
            flow_iter, flow_iter_pairs, prep_planes)
        h, w, D, win = 64, 96, 4, 9
        nF = 4
        R = jnp.asarray(rng.normal(size=(nF, 5, h, w)).astype(np.float32))
        fl = jnp.asarray(
            (rng.normal(size=(nF - 1, 2, h, w)) * 2.5).astype(np.float32))
        Rp = jax.vmap(lambda r: prep_planes(r, win, D, tile_h=32))(R)
        got = flow_iter_pairs(Rp, fl, win, D, (h, w), tile_h=32,
                              shift_skip=shift_skip, interpret=True)
        for b in range(nF - 1):
            want = flow_iter(Rp[b], Rp[b + 1], fl[b], win, D, tile_h=32,
                             shift_skip=shift_skip, img_hw=(h, w),
                             interpret=True)
            np.testing.assert_allclose(np.asarray(got[b]),
                                       np.asarray(want), atol=1e-5)

    def test_flow_iter_pairs_multi_clip_chaining(self, rng):
        """clip_len=T chains C clips' frames: pair b must read frames
        (p, p+1) with p = b + b // (T-1) — no pair straddles a clip
        boundary."""
        from kalman_hydra_tpu.kernels.flow_iter_pallas import (
            flow_iter, flow_iter_pairs, prep_planes)
        h, w, D, win, T, C = 64, 96, 3, 9, 3, 2
        R = jnp.asarray(
            rng.normal(size=(C * T, 5, h, w)).astype(np.float32))
        B = C * (T - 1)
        fl = jnp.asarray(
            (rng.normal(size=(B, 2, h, w)) * 2.0).astype(np.float32))
        Rp = jax.vmap(lambda r: prep_planes(r, win, D, tile_h=32))(R)
        got = flow_iter_pairs(Rp, fl, win, D, (h, w), tile_h=32,
                              clip_len=T, interpret=True)
        for b in range(B):
            p = b + b // (T - 1)
            want = flow_iter(Rp[p], Rp[p + 1], fl[b], win, D, tile_h=32,
                             img_hw=(h, w), interpret=True)
            np.testing.assert_allclose(np.asarray(got[b]),
                                       np.asarray(want), atol=1e-5)


class TestPairflowPipeline:
    def _run(self, cfg, frames, seeds=None):
        return jax.device_get(pl.track_arrays(jnp.asarray(frames), cfg,
                                              seeds=seeds))

    def _seeds(self, k=6, h=96, w=128):
        g = np.stack(np.meshgrid(np.linspace(12, w - 12, 3),
                                 np.linspace(12, h - 12, 2)),
                     axis=-1).reshape(-1, 2)[:k]
        return jnp.asarray(g.astype(np.float32))

    @pytest.mark.parametrize("impl", ["xla", "pallas"])
    def test_matches_scan_farneback(self, impl):
        frames = _clip()
        base = RunConfig(flow=FB, ekf=EkfConfig(state_dim=4),
                         tracks=TrackConfig(num_tracks=6),
                         impl=impl,
                         pallas_interpret=(impl == "pallas"))
        cfgs = dict(fast_warp=4, bf16_poly=False) \
            if impl == "pallas" else {}
        if cfgs:
            import dataclasses
            base = base.replace(
                flow=dataclasses.replace(base.flow, **cfgs))
        seeds = self._seeds()
        ref = self._run(base, frames, seeds)
        got = self._run(base.replace(pair_batch=True), frames, seeds)
        np.testing.assert_allclose(got["pos"], ref["pos"], atol=2e-4)
        np.testing.assert_array_equal(got["track_id"], ref["track_id"])
        np.testing.assert_array_equal(got["alive"], ref["alive"])

    def test_matches_scan_lk_dense(self):
        frames = _clip()
        cfg = RunConfig(flow=FlowConfig(method="lk_dense", levels=3),
                        ekf=EkfConfig(state_dim=4),
                        tracks=TrackConfig(num_tracks=6))
        seeds = self._seeds()
        ref = self._run(cfg, frames, seeds)
        got = self._run(cfg.replace(pair_batch=True), frames, seeds)
        np.testing.assert_allclose(got["pos"], ref["pos"], atol=2e-4)

    def test_matches_scan_with_reinit_cadence_and_lag(self):
        """Corner-pool refresh cadence + online fixed-lag smoothing both
        ride the pair-batched scan identically."""
        frames = _clip(t=8)
        cfg = RunConfig(flow=FB, ekf=EkfConfig(state_dim=4),
                        tracks=TrackConfig(num_tracks=6, reinit=True,
                                           reinit_every=3),
                        smooth=SmoothConfig(enabled=True, lag=2))
        ref = self._run(cfg, frames)
        got = self._run(cfg.replace(pair_batch=True), frames)
        np.testing.assert_allclose(got["pos"], ref["pos"], atol=2e-4)
        np.testing.assert_allclose(got["smoothed"], ref["smoothed"],
                                   atol=2e-4)
        np.testing.assert_array_equal(got["track_id"], ref["track_id"])

    @pytest.mark.parametrize("impl", ["xla", "pallas"])
    def test_multi_clip_matches_per_clip(self, impl):
        """track_clips_pairflow (BASELINE.json:10 multi-clip batch): all
        clips' pairs share each launch via clip_len chaining; per-clip
        trajectories match the single-clip pair pipeline."""
        clips = np.stack([_clip(), _clip()[::-1].copy()])
        cfg = RunConfig(flow=FB, ekf=EkfConfig(state_dim=4),
                        tracks=TrackConfig(num_tracks=6),
                        impl=impl, pair_batch=True,
                        pallas_interpret=(impl == "pallas"))
        if impl == "pallas":
            import dataclasses
            cfg = cfg.replace(flow=dataclasses.replace(
                cfg.flow, fast_warp=4, bf16_poly=False))
        seeds = self._seeds()
        got = jax.device_get(pl.track_clips_pairflow(
            jnp.asarray(clips), cfg, seeds=seeds))
        for b in range(2):
            ref = self._run(cfg, clips[b], seeds)
            np.testing.assert_allclose(got["pos"][b], ref["pos"],
                                       atol=2e-4)
            np.testing.assert_array_equal(got["alive"][b], ref["alive"])

    @pytest.mark.parametrize("impl", ["xla", "pallas"])
    def test_flow_sequence_matches_scan(self, impl):
        """flow_sequence (config 2's contract path, incl. the per-pixel
        EKF smoothing stage) through the pair-batched front end matches
        the per-frame scan."""
        frames = jnp.asarray(_clip())
        base = RunConfig(flow=FB, impl=impl,
                         pallas_interpret=(impl == "pallas"))
        if impl == "pallas":
            import dataclasses
            base = base.replace(flow=dataclasses.replace(
                base.flow, fast_warp=4, bf16_poly=False))
        for smooth in (False, True):
            ref = np.asarray(pl.flow_sequence(frames, base, smooth=smooth))
            got = np.asarray(pl.flow_sequence(
                frames, base.replace(pair_batch=True), smooth=smooth))
            np.testing.assert_allclose(got, ref, atol=2e-4)

    def test_flow_sequence_lk_dense_matches_scan(self):
        frames = jnp.asarray(_clip())
        cfg = RunConfig(flow=FlowConfig(method="lk_dense", levels=3))
        ref = np.asarray(pl.flow_sequence(frames, cfg))
        got = np.asarray(pl.flow_sequence(frames,
                                          cfg.replace(pair_batch=True)))
        np.testing.assert_allclose(got, ref, atol=2e-4)

    def test_config_validation(self):
        with pytest.raises(ValueError, match="pair_batch"):
            RunConfig(flow=FlowConfig(method="lk_sparse"),
                      pair_batch=True)
        with pytest.raises(ValueError, match="temporal_init"):
            RunConfig(flow=FlowConfig(temporal_init=True),
                      pair_batch=True)
        with pytest.raises(ValueError, match="flow-driven"):
            RunConfig(ekf=EkfConfig(measurement="photometric"),
                      pair_batch=True)
