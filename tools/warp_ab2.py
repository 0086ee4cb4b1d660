"""Round 2 warp shootout: patch-gather (one lax.gather, 2x2x5 slices) and
row-pair variants vs flat-take winner."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

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
    from jax import lax

    h, w, c = 1080, 1920, 5
    rng = np.random.default_rng(0)
    R = jnp.asarray(rng.uniform(0, 255, (h, w, c)).astype(np.float32))
    Rf = R.reshape(h * w, c)
    flow = jnp.asarray(rng.uniform(-3, 3, (h, w, 2)).astype(np.float32))
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]

    def coords(fl, acc):
        fx = jnp.clip(xs + fl[..., 0] + acc * 1e-20, 0.0, w - 1.0)
        fy = jnp.clip(ys + fl[..., 1], 0.0, h - 1.0)
        x0 = jnp.clip(jnp.floor(fx), 0, w - 2).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(fy), 0, h - 2).astype(jnp.int32)
        ax = (fx - x0.astype(jnp.float32))[..., None]
        ay = (fy - y0.astype(jnp.float32))[..., None]
        return x0, y0, ax, ay

    def patch_gather(fl, acc):
        x0, y0, ax, ay = coords(fl, acc)
        starts = jnp.stack([y0.reshape(-1), x0.reshape(-1)], axis=-1)
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        patches = lax.gather(R, starts, dn, slice_sizes=(2, 2, c),
                             mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        p = patches.reshape(h, w, 2, 2, c)
        out = (p[:, :, 0, 0] * (1 - ax) * (1 - ay)
               + p[:, :, 0, 1] * ax * (1 - ay)
               + p[:, :, 1, 0] * (1 - ax) * ay
               + p[:, :, 1, 1] * ax * ay)
        return jnp.sum(out[::64, ::64])

    def rowpair_gather(fl, acc):
        # flat (H*W, 5): two gathers with slice (2, c): x-neighbors per call
        x0, y0, ax, ay = coords(fl, acc)
        base0 = (y0 * w + x0).reshape(-1, 1)
        base1 = ((y0 + 1) * w + x0).reshape(-1, 1)
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0,))
        g0 = lax.gather(Rf, base0, dn, slice_sizes=(2, c),
                        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        g1 = lax.gather(Rf, base1, dn, slice_sizes=(2, c),
                        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        g0 = g0.reshape(h, w, 2, c)
        g1 = g1.reshape(h, w, 2, c)
        out = (g0[:, :, 0] * (1 - ax) * (1 - ay) + g0[:, :, 1] * ax * (1 - ay)
               + g1[:, :, 0] * (1 - ax) * ay + g1[:, :, 1] * ax * ay)
        return jnp.sum(out[::64, ::64])

    for name, fn in [("patch-gather 2x2xC", patch_gather),
                     ("rowpair-gather x2", rowpair_gather)]:
        try:
            dt = marginal(fn, (flow,))
            print(f"{name:22s} {dt*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:22s} FAILED {type(e).__name__}: {str(e)[:150]}",
                  flush=True)


if __name__ == "__main__":
    main()
