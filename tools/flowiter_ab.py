"""A/B timing of the Farneback inner-iteration pieces on TPU:
XLA warp / update_matrices / update_flow vs the fused Pallas kernel, plus
warp layout variants. Run solo (one TPU process!)."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

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

    times = {}
    for R in (r1, r2):
        comp = repeat(R)
        np.asarray(comp(*args))
        t0 = time.time()
        np.asarray(comp(*args))
        times[R] = time.time() - t0
    return (times[r2] - times[r1]) / (r2 - r1)


def main():
    import jax.numpy as jnp
    from kalman_hydra_tpu.ops import farneback as FB
    from kalman_hydra_tpu.kernels.flow_update_pallas import flow_update
    from kalman_hydra_tpu.kernels.polyexp_pallas import poly_expansion_planar

    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    R0 = FB.poly_expansion(img, 5, 1.1)
    R1 = FB.poly_expansion(img + 1.0, 5, 1.1)
    R0p = jnp.moveaxis(R0, -1, 0)
    R1p = jnp.moveaxis(R1, -1, 0)
    flow = jnp.asarray(rng.uniform(-3, 3, (h, w, 2)).astype(np.float32))
    flow_p = jnp.moveaxis(flow, -1, 0)

    def t_warp_hwc(R1, flow, acc):
        out = FB._warp_poly(R1, flow + acc * 1e-20)
        return jnp.sum(out[::64, ::64])

    def t_warp_planar(R1p, flow_p, acc):
        out = FB._warp_poly_planar(R1p, flow_p + acc * 1e-20)
        return jnp.sum(out[:, ::64, ::64])

    def t_updateM(R0, R1, flow, acc):
        out = FB.update_matrices(R0, R1, flow + acc * 1e-20)
        return jnp.sum(out[::64, ::64])

    def t_updateflow(M, acc):
        out = FB.update_flow(M + acc * 1e-20, 15, False)
        return jnp.sum(out[::64, ::64])

    def t_pallas_fused(R0p, R1p, flow_p, acc):
        R1w = FB._warp_poly_planar(R1p, flow_p + acc * 1e-20)
        out = flow_update(R0p, R1w, flow_p, 15, False)
        return jnp.sum(out[:, ::64, ::64])

    def t_pallas_nowarp(R0p, R1p, flow_p, acc):
        out = flow_update(R0p, R1p, flow_p + acc * 1e-20, 15, False)
        return jnp.sum(out[:, ::64, ::64])

    def t_polyexp_xla(img, acc):
        return jnp.sum(FB.poly_expansion(img + acc * 1e-20, 5, 1.1)[::64, ::64])

    def t_polyexp_pl(img, acc):
        return jnp.sum(poly_expansion_planar(img + acc * 1e-20, 5, 1.1)[:, ::64, ::64])

    def t_warp_ss(R1p, flow_p, acc):
        out = FB._warp_poly_selectsum_p(R1p, flow_p + acc * 1e-20, 8)
        return jnp.sum(out[:, ::64, ::64])

    def t_xla_iter_ss(R0p, R1p, flow_p, acc):
        # the current bench path: one full fine-level iteration
        Mp = FB.update_matrices_p(R0p, R1p, flow_p + acc * 1e-20,
                                  fast_warp=8)
        out = FB.update_flow_p(Mp, 15, False)
        return jnp.sum(out[:, ::64, ::64])

    def t_pallas_iter_ss(R0p, R1p, flow_p, acc):
        R1w = FB._warp_poly_selectsum_p(R1p, flow_p + acc * 1e-20, 8)
        out = flow_update(R0p, R1w, flow_p, 15, False)
        return jnp.sum(out[:, ::64, ::64])

    R0b = R0p.astype(jnp.bfloat16)
    R1b = R1p.astype(jnp.bfloat16)

    def t_xla_iter_ss_bf16(R0b, R1b, flow_p, acc):
        Mp = FB.update_matrices_p(R0b, R1b, flow_p + acc * 1e-20,
                                  fast_warp=8)
        out = FB.update_flow_p(Mp, 15, False)
        return jnp.sum(out[:, ::64, ::64])

    M = FB.update_matrices(R0, R1, flow)
    cases = [
        ("warp planar exact", t_warp_planar, (R1p, flow_p)),
        ("warp planar selectsum D=8", t_warp_ss, (R1p, flow_p)),
        ("XLA iter (ss warp+M+box+solve)", t_xla_iter_ss, (R0p, R1p, flow_p)),
        ("XLA iter bf16 planes", t_xla_iter_ss_bf16, (R0b, R1b, flow_p)),
        ("PALLAS iter (ss warp + kern)", t_pallas_iter_ss,
         (R0p, R1p, flow_p)),
        ("PALLAS kern only (no warp)", t_pallas_nowarp, (R0p, R1p, flow_p)),
        ("update_flow (box+solve)", t_updateflow, (M,)),
        ("polyexp XLA", t_polyexp_xla, (img,)),
        ("polyexp PALLAS", t_polyexp_pl, (img,)),
    ]
    for name, fn, args in cases:
        try:
            dt = marginal(fn, args)
            print(f"{name:34s} {dt*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:34s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
