"""Phase-knockout timing of the fused flow_iter kernel at 1080p.

Times the production-config kernel (th=64, shift_skip, bf16 slabs) with
each in-kernel phase knocked out via flow_iter(diag_skip=...) on a
REPRESENTATIVE input: a moving_blob_clip frame pair and a near-converged
prior flow (random noise defeats shift-skip and misstates the warp
cost). full - knockout = that phase's marginal cost; "dma" is the
launch+DMA floor. Run solo on TPU."""

import os
import sys
import time

sys.path.insert(0, ".")


def marginal(fn, args, r1=1, r2=5):
    import jax
    import jax.numpy as jnp
    import numpy as np
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
        np.asarray(comp(*args))                     # warm
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(comp(*args))
            ts.append(time.time() - t0)
        out[R] = min(ts)
    return (out[r2] - out[r1]) / (r2 - r1)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import numpy as np
    import jax.numpy as jnp
    from kalman_hydra_tpu.config import FlowConfig
    from kalman_hydra_tpu.io.synthetic import moving_blob_clip
    from kalman_hydra_tpu.ops import farneback as FB
    from kalman_hydra_tpu.kernels.flow_iter_pallas import flow_iter

    h, w = 1080, 1920
    frames, _ = moving_blob_clip(num_frames=2, height=h, width=w,
                                 color=False)
    img_a = jnp.asarray(np.asarray(frames[0], dtype=np.float32))
    img_b = jnp.asarray(np.asarray(frames[1], dtype=np.float32))

    fcfg = FlowConfig(fast_warp=8, bf16_poly=True)
    Ra = FB.polyexp_pyramid(img_a, fcfg, impl="pallas")
    Rb = FB.polyexp_pyramid(img_b, fcfg, impl="pallas")
    R0p, R1p = Ra[-1], Rb[-1]       # fine level (pyramids coarsest-first)

    # near-converged prior flow: the full pyramidal solve's output
    prior = FB.farneback_from_pyramids(Ra, Rb, fcfg, impl="pallas")
    prior = jnp.moveaxis(prior, -1, 0) if prior.shape[-1] == 2 else prior
    prior = prior.astype(jnp.float32)
    print(f"prior flow: shape {prior.shape}, "
          f"mean ({float(prior[0].mean()):.2f}, "
          f"{float(prior[1].mean()):.2f})", flush=True)

    th = int(os.environ.get("KH_FI_TH", "64"))
    variants = ["", "dma", "warp", "m", "border", "box", "solve",
                "damp", "rowfix", "colfix", "nocond",
                "m,box,solve", "warp,m,border,box,solve"]
    res = {}
    for dsk in variants:
        def fn(r0, r1, fl, acc, dsk=dsk):
            out = flow_iter(r0 + (acc * 1e-20).astype(r0.dtype), r1, fl,
                            fcfg.winsize, fcfg.fast_warp,
                            gaussian=fcfg.gaussian_win,
                            tile_h=th, shift_skip=True,
                            diag_skip=dsk)
            return jnp.sum(out[:, ::64, ::64])
        dt = marginal(fn, (R0p, R1p, prior))
        res[dsk] = dt * 1e3
        lbl = dsk or "full"
        print(f"{lbl:7s}: {dt*1e3:6.3f} ms", flush=True)

    full = res[""]
    print(f"\nfloor (launch+DMA)      : {res['dma']:.3f} ms", flush=True)
    for dsk in variants[2:]:
        print(f"KO {dsk:24s} marginal : {full - res[dsk]:6.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
