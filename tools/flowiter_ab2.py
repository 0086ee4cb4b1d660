"""A/B timing of flow_iter (fully fused Pallas Farneback iteration)
variants on TPU: storage dtype (f32 vs bf16 slabs) x row-tile height.
Run solo (one TPU process!). Relay-safe marginal timing as flowiter_ab.
"""

import os
import sys
import time

sys.path.insert(0, ".")


def marginal(fn_builder, args, r1=1, r2=5):
    import jax
    import jax.numpy as jnp
    from jax import lax

    def repeat(R):
        def run(*a):
            def body(_i, acc):
                out = fn_builder(*a, acc)
                return acc + out * 1e-6
            return lax.fori_loop(0, R, body, jnp.float32(0.0))
        return jax.jit(run).lower(*args).compile()

    import numpy as np
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
    from kalman_hydra_tpu.ops import farneback as FB
    from kalman_hydra_tpu.kernels.flow_iter_pallas import flow_iter

    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    R0p = FB.poly_expansion_p(img, 5, 1.1)
    R1p = FB.poly_expansion_p(img + 1.0, 5, 1.1)
    flow_p = jnp.asarray(rng.uniform(-3, 3, (2, h, w)).astype(np.float32))
    R0b = R0p.astype(jnp.bfloat16)
    R1b = R1p.astype(jnp.bfloat16)

    def case(r0, r1, th):
        def f(a, b, fl, acc):
            out = flow_iter(a, b, fl + acc * 1e-20, 15, 8, False, tile_h=th)
            return jnp.sum(out[:, ::64, ::64])
        return f, (r0, r1, flow_p)

    cases = []
    for th in (32, 64, 128, 256):
        f, a = case(R0p, R1p, th)
        cases.append((f"flow_iter f32  th={th:<3d}", f, a))
    for th in (32, 64, 128, 256):
        f, a = case(R0b, R1b, th)
        cases.append((f"flow_iter bf16 th={th:<3d}", f, a))

    # accuracy spot check: bf16 vs f32 kernel output
    for name, fn, args in cases:
        try:
            dt = marginal(fn, args)
            print(f"{name:26s} {dt*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:26s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    try:
        ref = flow_iter(R0p, R1p, flow_p, 15, 8, False)
        got = flow_iter(R0b, R1b, flow_p, 15, 8, False)
        d = float(np.asarray(jnp.abs(got - ref).max()))
        print(f"bf16-vs-f32 max |dflow|: {d:.2e} px", flush=True)
    except Exception as e:
        print(f"accuracy check FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
