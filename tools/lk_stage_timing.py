"""Stage timing for the sparse-LK pipeline at 1080p on TPU (relay-safe
marginal timing). Run solo (one TPU process!)."""

import sys
import time

sys.path.insert(0, ".")


def marginal(fn_builder, args, r1=1, r2=5):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    def repeat(R):
        def run(*a):
            def body(_i, acc):
                out = fn_builder(*a, acc)
                return acc + out * 1e-6
            return lax.fori_loop(0, R, body, jnp.float32(0.0))
        return jax.jit(run).lower(*args).compile()

    times = {}
    for R in (r1, r2):
        comp = repeat(R)
        np.asarray(comp(*args))
        t0 = time.time()
        np.asarray(comp(*args))
        times[R] = time.time() - t0
    return (times[r2] - times[r1]) / (r2 - r1)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import numpy as np
    import jax.numpy as jnp
    from kalman_hydra_tpu.config import FlowConfig
    from kalman_hydra_tpu.ops import lk as L

    h, w = 1080, 1920
    K = 1024
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    pts = jnp.asarray(
        np.stack([rng.uniform(20, w - 20, K), rng.uniform(20, h - 20, K)],
                 -1).astype(np.float32))
    import os
    cfg = FlowConfig(method="lk_sparse",
                     lk_block_halo=int(os.environ.get("KH_LK_HALO", "8")))
    print(f"cfg: levels={cfg.levels} win={cfg.lk_winsize} "
          f"iters={cfg.lk_max_iter} halo={cfg.lk_block_halo}", flush=True)

    def t_pyramid(img, acc):
        pyr, grads = L.lk_pyramid(img + acc * 1e-20, cfg)
        return sum(jnp.sum(p[::64, ::64]) for p in pyr) + \
            sum(jnp.sum(g[0][::64, ::64]) for g in grads)

    def t_full(a, b, pts, acc):
        np_, st = L.lk_sparse(a, b, pts + acc * 1e-6, cfg)
        return jnp.sum(np_) * 1e-3

    def t_full_cached(a, b, pts, acc):
        # pipeline shape: prev pyramid cached, next built fresh
        prev = L.lk_pyramid(a, cfg)
        nxt = (L.build_pyramid(b + acc * 1e-20, cfg.levels),)
        np_, st = L.lk_sparse(a, b, pts + acc * 1e-6, cfg,
                              prev_pyr=prev)
        return jnp.sum(np_) * 1e-3

    # per-level batched tracking cost (level 0 = full res)
    from kalman_hydra_tpu.ops.pyramid import build_pyramid
    pyr_a = build_pyramid(a, cfg.levels)
    pyr_b = build_pyramid(b, cfg.levels)

    def level_case(lvl):
        ia = pyr_a[lvl]
        ib = pyr_b[lvl]
        gx, gy = L.scharr_gradients(ia)
        half = (cfg.lk_winsize - 1) // 2
        pad = half + 2
        pa = jnp.pad(ia, pad, mode="edge")
        pb = jnp.pad(ib, pad, mode="edge")
        pgx = jnp.pad(gx, pad, mode="edge")
        pgy = jnp.pad(gy, pad, mode="edge")
        hl, wl = ia.shape
        pt_l = jnp.clip(pts * (1.0 / 2 ** lvl), 0.0,
                        jnp.asarray([wl - 1.0, hl - 1.0])) + pad

        def f(pa, pb, pgx, pgy, pt_l, acc):
            g, ok, _ = L._lk_level_batched(pa, pb, pgx, pgy,
                                           pt_l + acc * 1e-6, pt_l, cfg)
            return jnp.sum(g) * 1e-3

        def fk(pa, pb, pgx, pgy, pt_l, acc):
            g, ok, _ = L._lk_level_batched_klast(pa, pb, pgx, pgy,
                                                 pt_l + acc * 1e-6, pt_l,
                                                 cfg)
            return jnp.sum(g) * 1e-3

        def fc(pa, pb, pgx, pgy, pt_l, acc):
            g, ok, _ = L._lk_level_batched_corr(pa, pb, pgx, pgy,
                                                pt_l + acc * 1e-6, pt_l,
                                                cfg, use_conv=False)
            return jnp.sum(g) * 1e-3

        def fcc(pa, pb, pgx, pgy, pt_l, acc):
            g, ok, _ = L._lk_level_batched_corr(pa, pb, pgx, pgy,
                                                pt_l + acc * 1e-6, pt_l,
                                                cfg, use_conv=True)
            return jnp.sum(g) * 1e-3

        # micro-stages of the corr path: block gather alone, table build
        # alone (both builders) — isolates where the level budget goes
        w_ = cfg.lk_winsize
        half_ = (w_ - 1) * 0.5
        D_ = cfg.lk_block_halo
        Bb_ = w_ + 1 + 2 * D_
        n_off = 2 * D_ + 2

        def gather_only(pa, pb, pgx, pgy, pt_l, acc):
            Hp, Wp = pb.shape
            q = pt_l + acc * 1e-6
            bbx = jnp.clip(jnp.floor(q[:, 0] - half_).astype(jnp.int32) - D_,
                           0, Wp - Bb_)
            bby = jnp.clip(jnp.floor(q[:, 1] - half_).astype(jnp.int32) - D_,
                           0, Hp - Bb_)
            blk = L._gather_blocks_klast(pb[None], bby, bbx, Bb_)[0]
            return jnp.sum(blk[::8, ::8, ::64]) * 1e-6

        def make_tables_case(use_conv):
            def tables_only(pa, pb, pgx, pgy, pt_l, acc):
                Hp, Wp = pb.shape
                q = pt_l + acc * 1e-6
                bbx = jnp.clip(
                    jnp.floor(q[:, 0] - half_).astype(jnp.int32) - D_,
                    0, Wp - Bb_)
                bby = jnp.clip(
                    jnp.floor(q[:, 1] - half_).astype(jnp.int32) - D_,
                    0, Hp - Bb_)
                blk = L._gather_blocks_klast(pb[None], bby, bbx, Bb_)[0]
                t = blk[:w_, :w_, :]            # stand-in template (w,w,K)
                C = L._corr_tables(blk, t, n_off, w_, use_conv)
                return jnp.sum(C[::4, ::4, ::64]) * 1e-6
            return tables_only

        return (f, fk, fc, fcc, gather_only, make_tables_case(False),
                make_tables_case(True), (pa, pb, pgx, pgy, pt_l))

    def t_pyramid_pl(img, acc):
        pyr, grads = L.lk_pyramid(img + acc * 1e-20, cfg, impl="pallas")
        return sum(jnp.sum(p[::64, ::64]) for p in pyr) + \
            sum(jnp.sum(g[0][::64, ::64]) for g in grads)

    cases = [("pyramid+scharr (1 frame)", t_pyramid, (a,)),
             ("pyramid+scharr PALLAS", t_pyramid_pl, (a,)),
             ("lk_sparse full (no cache)", t_full, (a, b, pts)),
             ("lk_sparse pipeline-shape", t_full_cached, (a, b, pts))]
    for lvl in (0, 1, 2):
        f, fk, fc, fcc, gth, tbl, tblc, args = level_case(lvl)
        cases.append((f"level {lvl} K-last track", fk, args))
        cases.append((f"level {lvl} corr track", fc, args))
        cases.append((f"level {lvl} corr_conv track", fcc, args))
        cases.append((f"level {lvl} gather only", gth, args))
        cases.append((f"level {lvl} tables slices", tbl, args))
        cases.append((f"level {lvl} tables conv", tblc, args))

    for name, fn, args in cases:
        try:
            dt = marginal(fn, args)
            print(f"{name:28s} {dt*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
