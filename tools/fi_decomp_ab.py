"""Decompose 1080p Pallas flow cost: per-iteration vs fixed overhead.

Times farneback_from_pyramids (precomputed pyramids, all levels) at
iterations=1/2/3 and levels=1/5 with the relay-safe in-jit repeat
differencing. The slope over iterations is the true marginal cost of one
warp+box+solve pass across all levels; the intercept is the per-frame
fixed cost (level setup, inter-level resizes, launch overhead). Run solo
on TPU."""

import os
import sys
import time

sys.path.insert(0, ".")
# (fi_shift_skip/fi_tile_h winners are FlowConfig defaults now)


def marginal_clip(make_fn, r1=2, r2=6):
    """Repeat-differencing at the multi-run level: each repeat re-runs
    the full flow with a carry-dependent perturbation."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    fn = make_fn()

    def repeat(R):
        def run():
            def body(_i, acc):
                return acc + fn(acc) * 1e-6
            return lax.fori_loop(0, R, body, jnp.float32(0.0))
        return jax.jit(run).lower().compile()

    out = {}
    for R in (r1, r2):
        comp = repeat(R)
        np.asarray(comp())                      # warm
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(comp())
            ts.append(time.time() - t0)
        out[R] = min(ts)
    return (out[r2] - out[r1]) / (r2 - r1)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import numpy as np
    import jax.numpy as jnp
    from kalman_hydra_tpu.config import FlowConfig
    from kalman_hydra_tpu.ops import farneback as FB

    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    img_a = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    img_b = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))

    results = {}
    for label, iters, levels in [("it1_lv5", 1, 5), ("it2_lv5", 2, 5),
                                 ("it3_lv5", 3, 5), ("it3_lv1", 3, 1),
                                 ("it1_lv1", 1, 1)]:
        fcfg = FlowConfig(fast_warp=8, bf16_poly=True,
                          iterations=iters, levels=levels)
        Ra = FB.polyexp_pyramid(img_a, fcfg, impl="pallas")
        Rb = FB.polyexp_pyramid(img_b, fcfg, impl="pallas")

        def make_fn(Ra=Ra, Rb=Rb, fcfg=fcfg):
            def fn(acc):
                Ra2 = jax.tree.map(
                    lambda x: x + (acc * 1e-20).astype(x.dtype), Ra)
                out = FB.farneback_from_pyramids(Ra2, Rb, fcfg,
                                                 impl="pallas")
                return jnp.sum(out[::64, ::64])
            return fn

        dt = marginal_clip(make_fn)
        results[label] = dt * 1e3
        print(f"{label}: {dt*1e3:7.2f} ms/flow", flush=True)

    it = results
    if all(k in it for k in ("it1_lv5", "it2_lv5", "it3_lv5")):
        slope = (it["it3_lv5"] - it["it1_lv5"]) / 2.0
        print(f"per-iteration (all levels): {slope:.2f} ms; "
              f"fixed (resizes/setup): {it['it1_lv5'] - slope:.2f} ms",
              flush=True)
    if "it3_lv1" in it and "it3_lv5" in it:
        print(f"coarse levels add: {it['it3_lv5'] - it['it3_lv1']:.2f} ms",
              flush=True)
    if "it3_lv1" in it and "it1_lv1" in it:
        print(f"fine-only per-iteration: "
              f"{(it['it3_lv1'] - it['it1_lv1']) / 2.0:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
