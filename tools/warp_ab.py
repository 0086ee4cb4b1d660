"""Warp-gather formulation shootout on TPU (the 55ms bottleneck).

Variants of 'bilinearly sample 5 coefficient planes at p + flow(p)':
  hwc-adv     : (H, W, 5)[y0, x0] advanced indexing (current)
  flat-take   : reshape (H*W, 5); jnp.take rows by linear index
  two-pass    : take_along_axis rows (axis 0) then cols (axis 1), exact
  flat-bf16   : flat-take on bfloat16 planes
"""

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

    h, w, c = 1080, 1920, 5
    rng = np.random.default_rng(0)
    R = jnp.asarray(rng.uniform(0, 255, (h, w, c)).astype(np.float32))
    Rf = R.reshape(h * w, c)
    Rb = Rf.astype(jnp.bfloat16)
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

    def hwc_adv(Rx, fl, acc):
        x0, y0, ax, ay = coords(fl, acc)
        out = (Rx[y0, x0] * (1 - ax) * (1 - ay)
               + Rx[y0, x0 + 1] * ax * (1 - ay)
               + Rx[y0 + 1, x0] * (1 - ax) * ay
               + Rx[y0 + 1, x0 + 1] * ax * ay)
        return jnp.sum(out[::64, ::64])

    def flat_take(Rx, fl, acc):
        x0, y0, ax, ay = coords(fl, acc)
        base = y0 * w + x0
        g = lambda idx: jnp.take(Rx, idx, axis=0)
        out = (g(base) * (1 - ax) * (1 - ay)
               + g(base + 1) * ax * (1 - ay)
               + g(base + w) * (1 - ax) * ay
               + g(base + w + 1) * ax * ay)
        return jnp.sum(out[::64, ::64])

    def two_pass(Rx, fl, acc):
        x0, y0, ax, ay = coords(fl, acc)
        # pass 1: vertical lerp with per-pixel row index, per channel
        out_ch = []
        for ch in range(c):
            plane = Rx[..., ch]
            top = jnp.take_along_axis(plane, y0, axis=0)
            bot = jnp.take_along_axis(plane, y0 + 1, axis=0)
            v = top * (1 - ay[..., 0]) + bot * ay[..., 0]
            lv = jnp.take_along_axis(v, x0, axis=1)
            rv = jnp.take_along_axis(v, x0 + 1, axis=1)
            out_ch.append(lv * (1 - ax[..., 0]) + rv * ax[..., 0])
        return jnp.sum(jnp.stack(out_ch, -1)[::64, ::64])

    def selectsum(Rx, fl, acc, D=8):
        """Gather-free warp: one-hot select over +-D shifted copies.

        Exact in the vertical pass; horizontal pass approximates by using
        the vertically-lerped field at neighbor columns (error ~ flow
        gradient x subpixel, negligible for smooth fields). Displacement
        clamped to +-D.
        """
        dxf = jnp.clip(fl[..., 0] + acc * 1e-20, -D, D)
        dyf = jnp.clip(fl[..., 1], -D, D)
        y_idx = jnp.floor(dyf).astype(jnp.int32)          # in [-D, D]
        x_idx = jnp.floor(dxf).astype(jnp.int32)
        ay = (dyf - y_idx.astype(jnp.float32))[..., None]
        ax = (dxf - x_idx.astype(jnp.float32))[..., None]
        Rp = jnp.pad(Rx, ((D + 1, D + 1), (0, 0), (0, 0)), mode="edge")

        vt = 0.0
        vb = 0.0
        for d in range(-D, D + 1):
            m = (y_idx == d)[..., None]
            sh = Rp[D + 1 + d:D + 1 + d + h]
            sh1 = Rp[D + 2 + d:D + 2 + d + h]
            vt = vt + jnp.where(m, sh, 0.0)
            vb = vb + jnp.where(m, sh1, 0.0)
        v = vt * (1 - ay) + vb * ay
        vp = jnp.pad(v, ((0, 0), (D + 1, D + 1), (0, 0)), mode="edge")
        ut = 0.0
        ub = 0.0
        for e in range(-D, D + 1):
            m = (x_idx == e)[..., None]
            ut = ut + jnp.where(m, vp[:, D + 1 + e:D + 1 + e + w], 0.0)
            ub = ub + jnp.where(m, vp[:, D + 2 + e:D + 2 + e + w], 0.0)
        out = ut * (1 - ax) + ub * ax
        return jnp.sum(out[::64, ::64])

    R1 = R[..., :1]

    def flat_take_1ch(fl, acc):
        x0, y0, ax, ay = coords(fl, acc)
        base = y0 * w + x0
        Rf1 = R1.reshape(h * w, 1)
        g = lambda idx: jnp.take(Rf1, idx, axis=0)
        out = (g(base) * (1 - ax) * (1 - ay) + g(base + 1) * ax * (1 - ay)
               + g(base + w) * (1 - ax) * ay + g(base + w + 1) * ax * ay)
        return jnp.sum(out[::64, ::64])

    cases = [
        ("hwc-adv (current)", lambda fl, acc: hwc_adv(R, fl, acc)),
        ("flat-take", lambda fl, acc: flat_take(Rf, fl, acc)),
        ("flat-take-1ch", flat_take_1ch),
        ("flat-bf16", lambda fl, acc: jnp.float32(
            flat_take(Rb, fl, acc))),
        ("two-pass tal", lambda fl, acc: two_pass(R, fl, acc)),
        ("selectsum D=8", lambda fl, acc: selectsum(R, fl, acc, 8)),
        ("selectsum D=16", lambda fl, acc: selectsum(R, fl, acc, 16)),
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
