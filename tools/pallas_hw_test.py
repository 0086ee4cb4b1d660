"""Hardware verification of the Pallas kernels (run when Mosaic works).

Compiles each Pallas kernel on the real TPU and compares against its XLA
twin computed on the same device. SIGALRM hard-kill bounds a hung remote
compile. Usage: python tools/pallas_hw_test.py [kernel ...] [--timeout S]

Kernels: pyramid levels scharr polyexp flow_update flow_iter ekf lk
"""

import os
import signal
import sys
import time


def _alarm(_s, _f):
    print("PALLAS HW TEST: TIMED OUT", flush=True)
    os._exit(2)


def check(name, got, ref, tol):
    """Compare on DEVICE and fetch only the scalar: the axon relay's D2H
    is ~MB/min, so fetching full arrays here can blow the SIGALRM budget
    on a slow day. numpy inputs (already fetched/masked) pass through."""
    import numpy as np
    if isinstance(got, np.ndarray) or isinstance(ref, np.ndarray):
        err = float(np.abs(np.asarray(got) - np.asarray(ref)).max())
    else:
        import jax.numpy as jnp
        err = float(np.asarray(jnp.abs(got - ref).max()))
    ok = err < tol
    print(f"{name}: {'OK' if ok else 'FAIL'} max_err={err:.2e} tol={tol}",
          flush=True)
    return ok


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    timeout = 600
    for a in sys.argv[1:]:
        if a.startswith("--timeout"):
            timeout = int(a.split("=")[1])
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(timeout)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from kalman_hydra_tpu.config import EkfConfig, FlowConfig
    from kalman_hydra_tpu.io.synthetic import translating_pair

    which = set(args) or {"pyramid", "levels", "scharr", "polyexp",
                          "flow_update", "flow_iter", "pairs", "pipe",
                          "flow_level", "ekf", "lk"}
    print(f"device: {jax.devices()[0]}; kernels: {sorted(which)}",
          flush=True)
    a, b, _ = translating_pair(height=270, width=480, shift=(2.0, -1.3))
    a_d, b_d = jnp.asarray(a), jnp.asarray(b)
    ok = True

    if "pyramid" in which:
        from kalman_hydra_tpu.kernels.pyramid_pallas import pyr_down
        from kalman_hydra_tpu.ops.pyramid import pyr_down as pyr_down_xla
        t0 = time.time()
        got = pyr_down(a_d)
        ref = pyr_down_xla(a_d)
        ok &= check(f"pyramid ({time.time()-t0:.0f}s)", got, ref, 1e-3)

    if "levels" in which:
        from kalman_hydra_tpu.kernels.level_image_pallas import (
            farneback_images_pallas)
        from kalman_hydra_tpu.ops.pyramid import farneback_images
        t0 = time.time()
        got = farneback_images_pallas(a_d, 4, 0.5)
        ref = farneback_images(a_d, 4, 0.5)
        for li, (g, r) in enumerate(zip(got, ref)):
            ok &= check(f"levels[{li}] ({time.time()-t0:.0f}s)", g, r,
                        1e-2)

    if "scharr" in which:
        from kalman_hydra_tpu.kernels.scharr_pallas import (
            scharr_gradients as sg_pl)
        from kalman_hydra_tpu.ops.lk import scharr_gradients as sg_xla
        t0 = time.time()
        gx, gy = sg_pl(a_d)
        rx, ry = sg_xla(a_d)
        ok &= check(f"scharr.gx ({time.time()-t0:.0f}s)", gx, rx, 1e-3)
        ok &= check("scharr.gy", gy, ry, 1e-3)

    if "polyexp" in which:
        from kalman_hydra_tpu.kernels.polyexp_pallas import (
            poly_expansion_planar)
        from kalman_hydra_tpu.ops.farneback import poly_expansion_p
        t0 = time.time()
        got = poly_expansion_planar(a_d, 5, 1.1)
        ref = poly_expansion_p(a_d, 5, 1.1)
        ok &= check(f"polyexp ({time.time()-t0:.0f}s)", got, ref, 1e-2)

    if "flow_update" in which:
        from kalman_hydra_tpu.kernels.flow_update_pallas import flow_update
        from kalman_hydra_tpu.ops.farneback import (
            poly_expansion_p, _warp_poly_planar, update_matrices_p,
            update_flow_p)
        R0 = poly_expansion_p(a_d, 5, 1.1)
        R1 = poly_expansion_p(b_d, 5, 1.1)
        fl0 = jnp.zeros((2,) + a.shape, jnp.float32)
        R1w = _warp_poly_planar(R1, fl0)
        t0 = time.time()
        got = flow_update(R0, R1w, fl0, 15, False)
        ref = update_flow_p(update_matrices_p(R0, R1, fl0), 15, False)
        ok &= check(f"flow_update ({time.time()-t0:.0f}s)", got, ref, 1e-3)

    if "flow_iter" in which:
        from kalman_hydra_tpu.kernels.flow_iter_pallas import flow_iter
        from kalman_hydra_tpu.ops.farneback import (
            poly_expansion_p, update_matrices_p, update_flow_p)
        R0 = poly_expansion_p(a_d, 5, 1.1)
        R1 = poly_expansion_p(b_d, 5, 1.1)
        rng0 = np.random.default_rng(1)
        fl = jnp.asarray(rng0.uniform(-4, 4, (2,) + a.shape)
                         .astype(np.float32))
        ref = update_flow_p(
            update_matrices_p(R0, R1, fl, fast_warp=8).astype(jnp.float32),
            15, False)
        t0 = time.time()
        got = flow_iter(R0, R1, fl, 15, 8, False)
        ok &= check(f"flow_iter ({time.time()-t0:.0f}s)", got, ref, 1e-3)
        for th in (64, 128):
            got = flow_iter(R0, R1, fl, 15, 8, False, tile_h=th)
            ok &= check(f"flow_iter th={th}", got, ref, 1e-3)
        got = flow_iter(R0.astype(jnp.bfloat16), R1.astype(jnp.bfloat16),
                        fl, 15, 8, False)
        ok &= check("flow_iter bf16", got, ref, 0.05)
        # tile-adaptive shift skipping (exact: skipped terms are zero)
        got = flow_iter(R0, R1, fl, 15, 8, False, shift_skip=True)
        ok &= check("flow_iter shift_skip", got, ref, 1e-3)
        got = flow_iter(R0.astype(jnp.bfloat16), R1.astype(jnp.bfloat16),
                        fl, 15, 8, False, shift_skip=True)
        ok &= check("flow_iter shift_skip bf16", got, ref, 0.05)
        # OPTFLOW_FARNEBACK_GAUSSIAN weights branch (round-3 verdict
        # missing #4: interpret-verified only until now)
        ref_g = update_flow_p(
            update_matrices_p(R0, R1, fl, fast_warp=8).astype(jnp.float32),
            15, True)
        got = flow_iter(R0, R1, fl, 15, 8, True)
        ok &= check("flow_iter gaussian", got, ref_g, 1e-3)
        got = flow_iter(R0.astype(jnp.bfloat16), R1.astype(jnp.bfloat16),
                        fl, 15, 8, True, shift_skip=True, tile_h=64)
        ok &= check("flow_iter gaussian bf16 skip th64", got, ref_g, 0.05)
        # band mode (sharded row slabs): a mid-image slab with its global
        # row offset must reproduce the full-image rows exactly in the
        # band interior (reach bw + D + 1 = 16 rows)
        RP = 16
        r0b, r1b = 64 - RP, 128 + RP
        got_b = flow_iter(R0[:, r0b:r1b], R1[:, r0b:r1b],
                          jnp.asarray(ref)[:, r0b:r1b], 15, 8, False,
                          row0=r0b, img_h=R0.shape[1])
        ref_b = update_flow_p(
            update_matrices_p(R0, R1, jnp.asarray(ref), fast_warp=8)
            .astype(jnp.float32), 15, False)
        ok &= check("flow_iter band", got_b[:, RP:-RP], ref_b[:, 64:128],
                    1e-3)

    if "pairs" in which:
        # pair-batched launch (round-4: flow_iter_pairs, grid (B, tiles))
        # vs per-pair flow_iter on the same planes
        from kalman_hydra_tpu.kernels.flow_iter_pallas import (
            flow_iter, flow_iter_pairs, prep_planes)
        from kalman_hydra_tpu.ops.farneback import poly_expansion_p
        rng0 = np.random.default_rng(3)
        shifts = [(0.0, 0.0), (1.3, -0.8), (2.6, -1.6), (3.9, -2.4)]
        frames = [jnp.asarray(translating_pair(
            height=270, width=480, shift=s)[0]) for s in shifts]
        Rs = [poly_expansion_p(f, 5, 1.1) for f in frames]
        fl_b = jnp.asarray(rng0.uniform(-4, 4, (3, 2) + a.shape)
                           .astype(np.float32))
        for dt, tol in ((jnp.float32, 1e-3), (jnp.bfloat16, 0.05)):
            Rall = jnp.stack([prep_planes(R.astype(dt), 15, 8, 64)
                              for R in Rs])
            t0 = time.time()
            got = flow_iter_pairs(Rall, fl_b, 15, 8, a.shape, tile_h=64)
            for bi in range(3):
                ref = flow_iter(Rs[bi].astype(dt), Rs[bi + 1].astype(dt),
                                fl_b[bi], 15, 8, False, shift_skip=True,
                                tile_h=64)
                ok &= check(
                    f"flow_iter_pairs[{bi}] {dt.__name__} "
                    f"({time.time()-t0:.0f}s)", got[bi], ref, tol)

    if "pipe" in which:
        # strip-mined kernel (round-5: ALL iterations in one launch via a
        # skewed pipeline) vs n_iters sequential flow_iter launches
        from kalman_hydra_tpu.kernels.flow_iter_pallas import (
            flow_iter, flow_iters_pipelined, prep_planes)
        from kalman_hydra_tpu.ops.farneback import poly_expansion_p
        R0 = poly_expansion_p(a_d, 5, 1.1)
        R1 = poly_expansion_p(b_d, 5, 1.1)
        rng0 = np.random.default_rng(5)
        fl = jnp.asarray(rng0.uniform(-4, 4, (2,) + a.shape)
                         .astype(np.float32))
        for dt, tol, th in ((jnp.float32, 1e-3, 0), (jnp.float32, 1e-3, 64),
                            (jnp.bfloat16, 0.05, 64)):
            R0p = prep_planes(R0.astype(dt), 15, 8, tile_h=th)
            R1p = prep_planes(R1.astype(dt), 15, 8, tile_h=th)
            ref = fl
            for _ in range(3):
                ref = flow_iter(R0p, R1p, ref, 15, 8, False, tile_h=th,
                                shift_skip=True, img_hw=a.shape)
            t0 = time.time()
            got = flow_iters_pipelined(R0p, R1p, fl, 15, 8, 3, a.shape,
                                       tile_h=th, shift_skip=True)
            ok &= check(f"fi_pipe {dt.__name__} th={th} "
                        f"({time.time()-t0:.0f}s)", got, ref, tol)

    if "flow_level" in which:
        from kalman_hydra_tpu.kernels.flow_level_pallas import flow_level
        from kalman_hydra_tpu.ops.farneback import (
            poly_expansion_p, update_matrices_p, update_flow_p)
        # coarse-level size (L2 of a 1080p pyramid)
        ac = a_d[:136, :240]
        bc = b_d[:136, :240]
        R0 = poly_expansion_p(ac, 5, 1.1)
        R1 = poly_expansion_p(bc, 5, 1.1)
        rng0 = np.random.default_rng(2)
        fl = jnp.asarray(rng0.uniform(-4, 4, (2, 136, 240))
                         .astype(np.float32))
        ref = fl
        for _ in range(3):
            ref = update_flow_p(
                update_matrices_p(R0, R1, ref, fast_warp=8)
                .astype(jnp.float32), 15, False)
        t0 = time.time()
        got = flow_level(R0, R1, fl, 15, 8, 3)
        ok &= check(f"flow_level ({time.time()-t0:.0f}s)", got, ref, 1e-3)
        got = flow_level(R0.astype(jnp.bfloat16), R1.astype(jnp.bfloat16),
                         fl, 15, 8, 3)
        ok &= check("flow_level bf16", got, ref, 0.25)
        ref_g = fl
        for _ in range(3):
            ref_g = update_flow_p(
                update_matrices_p(R0, R1, ref_g, fast_warp=8)
                .astype(jnp.float32), 15, True)
        got = flow_level(R0, R1, fl, 15, 8, 3, gaussian=True)
        ok &= check("flow_level gaussian", got, ref_g, 1e-3)

    if "ekf" in which:
        from kalman_hydra_tpu.kernels.ekf_pallas import ekf_fused_step
        from kalman_hydra_tpu.models import dynamics as dyn
        from kalman_hydra_tpu.models import ekf as jekf
        cfg = EkfConfig(state_dim=6)
        rng = np.random.default_rng(0)
        K = 600
        F = dyn.transition(cfg)
        Q = dyn.process_noise(cfg)
        H = dyn.position_H(cfg)
        R = (cfg.r * np.eye(2)).astype(np.float32)
        x = rng.normal(size=(K, 6)).astype(np.float32)
        P = np.broadcast_to(np.eye(6, dtype=np.float32) * 3,
                            (K, 6, 6)).copy()
        z = rng.normal(size=(K, 2)).astype(np.float32) * 3
        xp, Pp = jekf.predict(jnp.asarray(x), jnp.asarray(P),
                              jnp.asarray(F), jnp.asarray(Q))
        y = jnp.asarray(z) - xp[:, 0:2]
        xr, Pr, nr = jekf.update(xp, Pp, y, jnp.asarray(H), jnp.asarray(R))
        t0 = time.time()
        xg, Pg, ng = ekf_fused_step(jnp.asarray(x), jnp.asarray(P), y,
                                    jnp.asarray(H), F, Q, cfg.r)
        ok &= check(f"ekf.x ({time.time()-t0:.0f}s)", xg, xr, 1e-3)
        ok &= check("ekf.P", Pg, Pr, 1e-3)

    if "lk" in which:
        from kalman_hydra_tpu.kernels.lk_pallas import lk_sparse as lk_pl
        from kalman_hydra_tpu.ops.lk import lk_sparse as lk_xla
        cfg = FlowConfig(levels=3)
        pts = np.stack(np.meshgrid(np.arange(40, 440, 40),
                                   np.arange(40, 230, 40)), -1)
        pts = pts.reshape(-1, 2).astype(np.float32)
        t0 = time.time()
        # no try/except here: the aligned-DMA lk kernel is hardware-verified
        # (round 2) — a Mosaic rejection is a REGRESSION and must fail the run
        gp, gs = lk_pl(a_d, b_d, jnp.asarray(pts), cfg)
        rp, rs = lk_xla(a_d, b_d, jnp.asarray(pts), cfg)
        m = np.asarray(gs) & np.asarray(rs)
        ok &= check(f"lk ({time.time()-t0:.0f}s)",
                    np.asarray(gp)[m], np.asarray(rp)[m], 0.05)

    print(f"PALLAS HW TEST: {'ALL OK' if ok else 'FAILURES'}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
