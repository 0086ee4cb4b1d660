"""Stage timing v2: where does the optimized (planar/fast-warp/bf16)
1080p pipeline spend its 30 ms? Run solo on the TPU."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np

sys.path.insert(0, ".")


def marginal(fn, args, r1=1, r2=5):
    import jax
    import jax.numpy as jnp
    from jax import lax

    def repeat(R):
        def run(*a):
            def body(_i, acc):
                return acc + fn(*a, acc) * 1e-6
            return lax.fori_loop(0, R, body, jnp.float32(0.0))
        return jax.jit(run).lower(*args).compile()

    out = {}
    for R in (r1, r2):
        comp = repeat(R)
        np.asarray(comp(*args))
        out[R] = min(time_fetch(comp, *args) for _ in range(2))
    return (out[r2] - out[r1]) / (r2 - r1)


def time_fetch(comp, *a):
    t0 = time.time()
    np.asarray(comp(*a))
    return time.time() - t0


def main():
    import jax.numpy as jnp
    from kalman_hydra_tpu.config import FlowConfig
    from kalman_hydra_tpu.ops import farneback as FB
    from kalman_hydra_tpu.ops.pyramid import farneback_images

    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    cfg = FlowConfig(fast_warp=8, bf16_poly=True)
    R0 = FB.polyexp_pyramid(img, cfg)
    R1 = FB.polyexp_pyramid(img2, cfg)
    R0f = R0[-1]  # finest level (5, 1080, 1920) bf16
    R1f = R1[-1]
    flow_p = jnp.asarray(rng.uniform(-3, 3, (2, h, w)).astype(np.float32))

    def t_full(a, acc):
        fl = FB.farneback(a + acc * 1e-20, img2, cfg)
        return jnp.sum(fl[::64, ::64])

    def t_pyr_polyexp(a, acc):
        Rs = FB.polyexp_pyramid(a + acc * 1e-20, cfg)
        return sum(jnp.sum(r[:, ::64, ::64].astype(jnp.float32)) for r in Rs)

    def t_images_only(a, acc):
        ims = farneback_images(a + acc * 1e-20, cfg.levels, cfg.pyr_scale)
        return sum(jnp.sum(i[::64, ::64]) for i in ims)

    def t_warp(fl, acc):
        out = FB._warp_poly_selectsum_p(R1f, fl + acc * 1e-20, 8)
        return jnp.sum(out[:, ::64, ::64].astype(jnp.float32))

    def t_updateM(fl, acc):
        M = FB.update_matrices_p(R0f, R1f, fl + acc * 1e-20, fast_warp=8)
        return jnp.sum(M[:, ::64, ::64])

    def t_solve(fl, acc):
        M = FB.update_matrices_p(R0f, R1f, fl, fast_warp=8)
        out = FB.update_flow_p(M + acc * 1e-20, 15, False)
        return jnp.sum(out[:, ::64, ::64])

    for name, fn, args in [
        ("FULL farneback 1080p (fast)", t_full, (img,)),
        ("  level images (blur+resize)", t_images_only, (img,)),
        ("  polyexp pyramid (all lvls)", t_pyr_polyexp, (img,)),
        ("  selectsum warp (fine lvl)", t_warp, (flow_p,)),
        ("  updateM incl warp (fine)", t_updateM, (flow_p,)),
        ("  updateM+box+solve (fine)", t_solve, (flow_p,)),
    ]:
        try:
            dt = marginal(fn, args)
            print(f"{name:32s} {dt*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:32s} FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
