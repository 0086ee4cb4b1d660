"""Minimal-repro floor study for the fused flow_iter kernel's DMA floor.

The round-3/4 ledger left "Mosaic scheduling is the gap" as a hypothesis
supported only by elimination (every structural coax was neutral at bench
level). This tool PINS the floor with a do-nothing kernel that replicates
flow_iter's exact DMA structure — double(+)-buffered halo'd slab copies
from ANY-space HBM refs into VMEM scratch, one (2, th, w) VMEM out block
per grid step — with everything else stripped. Sweeps:

  1. tile height (grid-step count at fixed total bytes),
  2. slab plane count / width (bytes at fixed step count),
  3. DMA slot count S (2 = production double buffering, 3/4 = deeper),
  4. a no-DMA control (pure launch + grid-step + out-write cost),
  5. a model-compute dial (k VPU passes over the slab) for overlap.

Fitting ms = a * steps + b * bytes across (1)+(2) gives the per-step
overhead and the effective DMA bandwidth; comparing S=2/3/4 says whether
deeper buffering can hide what double buffering doesn't. Run solo on TPU
(relay rule); results go to the BASELINE.md round-5 floor study.

Headline geometry (1080p, winsize 15, D=8, bf16 slabs): bw=7, hb=15,
rows=round_up(th+31, 16), wp=2048 — matches fi_geometry exactly.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def build_kernel(th, h, w, planes, wp, rows, nslots, dtype_name,
                 cwork, do_dma, interpret=False):
    """A pallas_call with flow_iter's DMA plumbing and a trivial body.

    Reads: r0, r1 (planes, Hp, wp) slabs + fl (2, Hp, wp) f32, halo'd
    exactly like flow_iter (rows per step at offset i*th). Body: `cwork`
    multiply-add passes over the slab center (0 = consume-only).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    h_pad = _round_up(h, th)
    nsteps = h_pad // th

    def kernel(r0_hbm, r1_hbm, fl_hbm, out_ref, r0_s, r1_s, fl_s, sem):
        i = pl.program_id(0)
        n = pl.num_programs(0)

        def copies(step, slot):
            pairs = ((r0_hbm, r0_s), (r1_hbm, r1_s), (fl_hbm, fl_s))
            return [pltpu.make_async_copy(
                src.at[:, pl.ds(step * th, rows), :],
                dst.at[slot], sem.at[slot, j])
                for j, (src, dst) in enumerate(pairs)]

        if do_dma:
            @pl.when(i == 0)
            def _start_first():
                for k in range(nslots - 1):
                    if k < nsteps:
                        for c in copies(k, k):
                            c.start()

            @pl.when(i + nslots - 1 < n)
            def _prefetch():
                s1 = i + nslots - 1
                for c in copies(s1, s1 % nslots):
                    c.start()

            slot = i % nslots
            for c in copies(i, slot):
                c.wait()
            ww = min(w, wp)
            a = r0_s[slot, 0, :th, :ww].astype(jnp.float32)
            b = r1_s[slot, 0, :th, :ww].astype(jnp.float32)
            f0 = fl_s[slot, 0, :th, :ww]
            f1 = fl_s[slot, 1, :th, :ww]
        else:
            ww = w
            # Mosaic's tpu.iota is integer-only — iota i32 then cast
            a = jax.lax.broadcasted_iota(jnp.int32, (th, w), 1).astype(
                jnp.float32)
            b = a * 0.5
            f0 = a
            f1 = b

        acc = a + b
        for k in range(cwork):
            acc = acc * 1.0009 + b
        if ww == w:
            out_ref[0, :, :] = f0 + acc
            out_ref[1, :, :] = f1
        else:
            # narrow-slab variants: store the consumed columns, zero the
            # rest (both extents are 128-divisible at the swept widths)
            out_ref[0, :, :ww] = f0 + acc
            out_ref[0, :, ww:] = jnp.zeros((th, w - ww), jnp.float32)
            out_ref[1, :, :ww] = f1
            out_ref[1, :, ww:] = jnp.zeros((th, w - ww), jnp.float32)

    scratch = [
        pltpu.VMEM((nslots, planes, rows, wp), dtype),
        pltpu.VMEM((nslots, planes, rows, wp), dtype),
        pltpu.VMEM((nslots, 2, rows, wp), jnp.float32),
        pltpu.SemaphoreType.DMA((nslots, 3)),
    ]
    call = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec((2, th, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, h_pad, w), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )
    bytes_per_step = (2 * planes * rows * wp * (2 if dtype_name == "bf16"
                                                else 4)
                      + 2 * rows * wp * 4) if do_dma else 0
    out_bytes = 2 * th * w * 4
    return call, nsteps, bytes_per_step + out_bytes


def marginal(comp1, comp2, args, r1, r2):
    import numpy as np
    ts = {}
    for r, comp in ((r1, comp1), (r2, comp2)):
        np.asarray(comp(*args))                     # warm
        best = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(comp(*args))
            best.append(time.time() - t0)
        ts[r] = min(best)
    return (ts[r2] - ts[r1]) / (r2 - r1)


def run_variant(name, th, planes, wp_override, nslots, cwork, do_dma,
                h=1080, w=1920, dtype_name="bf16", r_pair=(8, 72)):
    # r_pair spans 64 repeats so the measured difference is >=10 ms even
    # for ~0.15 ms variants — the ~2 ms relay jitter drowned (1, 5)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    align = 16 if dtype_name == "bf16" else 8
    rows = _round_up(th + 2 * 15 + 1, align)
    wp = wp_override or 2048
    h_pad = _round_up(h, th)
    call, nsteps, bps = build_kernel(th, h, w, planes, wp, rows, nslots,
                                     dtype_name, cwork, do_dma)
    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    key = jax.random.PRNGKey(0)
    hp_in = h_pad + rows            # generous tail so i*th + rows fits
    r0 = jax.random.normal(key, (planes, hp_in, wp), jnp.float32).astype(
        dtype)
    r1 = r0 * 0.5
    fl = jnp.zeros((2, hp_in, wp), jnp.float32)

    def repeat(R):
        def run(a, b, f):
            def body(_i, acc):
                # carry-dependent perturbation on the SMALLEST input (the
                # flow) defeats loop-invariant hoisting; its ~20 MB add is
                # equal across variants at fixed wp (<0.03 ms)
                o = call(a, b, f + acc * 0)
                return acc + o[0, 0, 0] * 1e-9
            return lax.fori_loop(0, R, body, jnp.float32(0.0))
        return jax.jit(run).lower(r0, r1, fl).compile()

    t0 = time.time()
    c1 = repeat(r_pair[0])
    c2 = repeat(r_pair[1])
    compile_s = time.time() - t0
    ms = marginal(c1, c2, (r0, r1, fl), *r_pair) * 1e3
    total_mb = bps * nsteps / 1e6
    bw = total_mb / ms if ms > 0 else 0.0  # GB/s effective
    rec = {"variant": name, "th": th, "steps": nsteps, "planes": planes,
           "wp": wp, "slots": nslots, "cwork": cwork, "dma": do_dma,
           "ms": round(ms, 4), "mb_moved": round(total_mb, 1),
           "gbps_eff": round(bw, 1), "compile_s": round(compile_s, 1)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    recs = []
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    _rv = globals()["run_variant"]

    def run_variant(name, *a, **kw):   # noqa: F811 — argv subset filter
        if only and not any(s in name for s in only):
            return {"variant": name, "ms": 0, "mb_moved": 0,
                    "gbps_eff": 0, "skipped": True}
        return _rv(name, *a, **kw)

    # 1. no-DMA control: launch + grid-step + out-write cost only
    for th in (32, 64, 128):
        recs.append(run_variant(f"nodma_th{th}", th, 5, None, 2, 0, False))

    # 2. grid-step sweep at fixed bytes/step structure (bytes scale with
    #    rows ~ th + halo, steps = 1088/th: small th = more steps + more
    #    halo re-read)
    for th in (32, 64, 128):
        recs.append(run_variant(f"dma_th{th}", th, 5, None, 2, 0, True))

    # 3. byte sweep at fixed step count (th=64): planes 1/2/5, width
    #    1024/2048
    for planes in (1, 2):
        recs.append(run_variant(f"dma_p{planes}", 64, planes, None, 2, 0,
                                True))
    recs.append(run_variant("dma_w1024", 64, 5, 1024, 2, 0, True))

    # 4. slot-count sweep at th=64, pure DMA and with model compute
    for s in (3, 4):
        recs.append(run_variant(f"dma_s{s}", 64, 5, None, s, 0, True))
    for s in (2, 3):
        recs.append(run_variant(f"dma_s{s}_cw8", 64, 5, None, s, 8, True))

    # 5. compute-overlap dial at S=2 (does compute hide under DMA or
    #    serialize with it?)
    for cw in (2, 16, 32):
        recs.append(run_variant(f"dma_cw{cw}", 64, 5, None, 2, cw, True))

    # 6. steep compute dial: the slope (ms per FMA pass over the 64x1920
    #    core) calibrates the VPU's achieved speed on this exact slab
    #    layout — dividing the real tile body's measured ms by it says
    #    how many ideal passes the body "costs", vs its op count
    for cw in (64, 128, 256):
        recs.append(run_variant(f"dma_cw{cw}", 64, 5, None, 2, cw, True))

    print("== summary ==", file=sys.stderr)
    for r in recs:
        print(f"{r['variant']:>14}: {r['ms']:7.3f} ms  "
              f"{r['mb_moved']:7.1f} MB  {r['gbps_eff']:7.1f} GB/s",
              file=sys.stderr)


if __name__ == "__main__":
    main()
