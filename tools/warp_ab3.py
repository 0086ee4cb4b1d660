"""Select-sum warp timing (rolled fori_loop version from the library)."""

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
        t0 = time.time()
        np.asarray(comp(*args))
        out[R] = time.time() - t0
    return (out[r2] - out[r1]) / (r2 - r1)


def main():
    import jax.numpy as jnp
    from kalman_hydra_tpu.ops.farneback import (_warp_poly,
                                                _warp_poly_selectsum)

    h, w, c = 1080, 1920, 5
    rng = np.random.default_rng(0)
    R = jnp.asarray(rng.uniform(0, 255, (h, w, c)).astype(np.float32))
    flow = jnp.asarray(rng.uniform(-3, 3, (h, w, 2)).astype(np.float32))

    cases = [
        ("selectsum-rolled D=4",
         lambda fl, acc: jnp.sum(_warp_poly_selectsum(
             R, fl + acc * 1e-20, 4)[::64, ::64])),
        ("selectsum-rolled D=8",
         lambda fl, acc: jnp.sum(_warp_poly_selectsum(
             R, fl + acc * 1e-20, 8)[::64, ::64])),
        ("exact gather (ref)",
         lambda fl, acc: jnp.sum(_warp_poly(
             R, fl + acc * 1e-20)[::64, ::64])),
    ]
    for name, fn in cases:
        try:
            dt = marginal(fn, (flow,))
            print(f"{name:22s} {dt*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:22s} FAILED {type(e).__name__}: {str(e)[:150]}",
                  flush=True)


if __name__ == "__main__":
    main()
