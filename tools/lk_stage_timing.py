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
    cfg = FlowConfig(method="lk_sparse", lk_block_halo=8)
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
        return f, fk, (pa, pb, pgx, pgy, pt_l)

    cases = [("pyramid+scharr (1 frame)", t_pyramid, (a,)),
             ("lk_sparse full (no cache)", t_full, (a, b, pts)),
             ("lk_sparse pipeline-shape", t_full_cached, (a, b, pts))]
    for lvl in (0, 1, 2):
        f, fk, args = level_case(lvl)
        cases.append((f"level {lvl} batched track", f, args))
        cases.append((f"level {lvl} K-last track", fk, args))

    for name, fn, args in cases:
        try:
            dt = marginal(fn, args)
            print(f"{name:28s} {dt*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
