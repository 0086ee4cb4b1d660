"""Pallas-TPU FULLY fused Farneback iteration: warp + M + box + solve.

One kernel pass = one complete fine-level flow iteration. Each grid step
DMAs halo'd slabs of the two (unwarped) polyexp plane stacks and the
prior flow into VMEM, then does everything on-chip:

  1. select-sum bilinear warp of the R1 planes by the (clamped) prior
     flow — the same gather-free formulation as
     ops.farneback._warp_poly_selectsum_p, but on VMEM-resident slabs
     (the XLA version pays an HBM round trip for every shifted copy);
  2. averaged-matrix normal equations with OpenCV's border damping
     (ops.farneback.update_matrices_p);
  3. separable winsize smoothing (unrolled taps);
  4. the closed-form 2x2 solve for the new ABSOLUTE flow.

HBM traffic per iteration drops to one halo'd read of (R0, R1, flow) +
one flow write (~0.2 GB at 1080p) where the XLA pipeline moves ~1.4 GB —
this is the kernel the round-1 roofline pointed at (BASELINE.md: ~1.8 ms
bandwidth bound vs 18 ms measured per frame).

Displacement is clamped to +-D (= FlowConfig.fast_warp) per level, the
documented select-sum semantic bound. Tile height 32 keeps the slab set
inside the ~16 MB VMEM budget at 1080p (pallas_guide.md).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._store import batched_store
from ..ops.filters import gaussian_kernel
# OpenCV's border taper — single source of truth is the XLA twin
# (ops/farneback.py); every kernel that damps borders shares this
# _damp_vec so the constants can't silently diverge
from ..ops.farneback import _BORDER, _BORDER_SCALE


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _damp_vec(abs_idx, limit):
    idx = jnp.clip(abs_idx, 0, limit - 1)
    dist = jnp.minimum(idx, limit - 1 - idx)
    scale = jnp.ones_like(idx, dtype=jnp.float32)
    for d in range(_BORDER):
        scale = jnp.where(dist == d, jnp.float32(_BORDER_SCALE[d]), scale)
    return scale


def _flow_iter_kernel(th: int, w: int, h: int, bw: int, D: int,
                      rows: int, weights, has_row0, shift_skip,
                      diag_skip, *refs):
    """Double-buffered slab pipeline: scratch slabs have a leading 2-slot
    axis; step i computes from slot i%2 while the DMAs for tile i+1 land
    in slot (i+1)%2 (started before this step's wait, so the copies
    overlap the whole compute body).

    has_row0: an extra (1,) int32 SMEM input holds the GLOBAL image row
    of input row 0 — the spatially-sharded band path (parallel/spatial)
    runs this kernel on a local row slab, and the OpenCV border damping /
    M edge replication must use global image coordinates (h is then the
    global image height).

    shift_skip: tile-adaptive select-sum — reduce the tile's integer
    displacement range to scalars and `pl.when`-skip every shift term
    outside it. EXACT (skipped terms are identically zero); on smooth
    flow a 32-row tile spans 2-4 integer displacements, so most of the
    2(2D+2) warp passes vanish at runtime. Costs two extra VMEM
    accumulators; worst case (tile spanning all +-D) adds only the
    accumulator traffic."""
    if shift_skip:
        *refs, vacc, racc = refs
    refs = list(refs)
    r0_hbm, r1_hbm, fl_hbm = refs[:3]
    refs = refs[3:]
    if has_row0:
        row0_ref = refs.pop(0)
        row0 = row0_ref[0]
    else:
        row0 = 0
    out_ref, r0_s, r1_s, fl_s, sem = refs
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    hb = bw + D                       # warp+box halo
    mrows = th + 2 * bw               # rows where M is needed

    def copies(step, slot):
        pairs = ((r0_hbm, r0_s), (r1_hbm, r1_s), (fl_hbm, fl_s))
        return [
            pltpu.make_async_copy(src.at[:, pl.ds(step * th, rows), :],
                                  dst.at[slot], sem.at[slot, j])
            for j, (src, dst) in enumerate(pairs)]

    @pl.when(i == 0)
    def _start_first():
        for c in copies(0, 0):
            c.start()

    @pl.when(i + 1 < nsteps)
    def _prefetch_next():
        for c in copies(i + 1, (i + 1) % 2):
            c.start()

    slot = i % 2
    for c in copies(i, slot):
        c.wait()

    r0_sl = r0_s[slot]
    r1_sl = r1_s[slot]
    base = hb - bw
    if "dma" in diag_skip:
        # diagnostic floor: DMA + launch only, no compute. Output still
        # depends on all three slabs so nothing is DCE'd.
        out_ref[0, :, :] = (fl_s[slot, 0, D:D + th, base:base + w]
                            + r0_sl[0, D:D + th,
                                    base:base + w].astype(jnp.float32)
                            + r1_sl[0, D:D + th,
                                    base:base + w].astype(jnp.float32))
        out_ref[1, :, :] = fl_s[slot, 1, D:D + th, base:base + w]
        return
    accs = (vacc, racc) if shift_skip else ()
    mrows = th + 2 * bw
    return _tile_body(th, w, h, bw, D, weights, shift_skip, diag_skip,
                      i * th - bw + row0, r0_sl, r1_sl,
                      fl_s[slot, :, D:D + mrows, :], out_ref, accs)


def _tile_body(th, w, h, bw, D, weights, shift_skip, diag_skip, tile_lo,
               r0_sl, r1_sl, flm_in, out_ref, accs, ret=False):
    """The shared per-tile compute of the fused Farneback iteration —
    in-VMEM select-sum warp, averaged-matrix normal equations, OpenCV
    border damping + M edge replication, then _box_solve. The single-pair
    kernel (_flow_iter_kernel) and the pair-batched kernel
    (_flow_iter_pairs_kernel) differ ONLY in grid/DMA plumbing and both
    delegate here, so a numerics change cannot desynchronize them.

    tile_lo: GLOBAL image row of the M region's first row
    (i*th - bw, plus row0 in the spatially-sharded band mode); h/w are
    the GLOBAL image dims the border logic replicates at.

    flm_in: the prior flow at the M region — (2, mrows, wp) slab rows
    [D, D+mrows) in the padded column layout (callers slice their flow
    slab; the pipelined kernel assembles it from VMEM ring buffers).
    ret=True returns the solved (u, v) instead of storing to out_ref."""
    if shift_skip:
        vacc, racc = accs
    hb = bw + D
    mrows = th + 2 * bw
    base = hb - bw
    mcols = w + 2 * bw
    # warp accumulation stays f32 even for bf16 slabs (a bf16-accumulation
    # variant measured -7.5% fps — BASELINE.md round-3 rejected ledger)
    R1 = r1_sl.astype(jnp.float32)
    wdt = R1.dtype
    # flow at the M region (slab rows [D, D+mrows))
    flm = flm_in.astype(jnp.float32)
    dx = flm[0]
    dy = flm[1]

    if "warp" in diag_skip:
        # diagnostic knockout: unwarped center slice stands in for R1w
        R1w = R1[:, D:D + mrows, base:base + mcols]
    else:
        # ---- in-VMEM select-sum bilinear warp of R1 by (dx, dy) ----
        dxc = jnp.clip(dx, -D, D)
        dyc = jnp.clip(dy, -D, D)
        y_idx = jnp.floor(dyc).astype(jnp.int32)
        x_idx = jnp.floor(dxc).astype(jnp.int32)
        ay = (dyc - y_idx.astype(jnp.float32))[None]
        ax = (dxc - x_idx.astype(jnp.float32))[None]

        # fold the bilinear lerp into per-shift weights shared by all 5
        # planes: v = sum_j wj * R1[j:j+mrows] with
        # wj = [y_idx == j-D](1-ay) + [y_idx == j-1-D] ay  — one FMA per
        # shift per plane instead of two where+adds (the warp is
        # VPU-bound)
        ay2 = ay[0]
        xm = x_idx[:, base:base + mcols]
        axm2 = ax[0, :, base:base + mcols]

        if shift_skip:
            # tile-adaptive: only shifts inside the tile's displacement
            # range execute; the rest are skipped by the scalar pl.when
            # guards. Range over the REAL (edge-padded) columns only —
            # the zero tail beyond w + 2*hb would clamp to displacement
            # 0 and widen it.
            ymin = jnp.min(y_idx[:, :w + 2 * hb])
            ymax = jnp.max(y_idx[:, :w + 2 * hb])
            vacc[...] = jnp.zeros_like(vacc)

            for j in range(2 * D + 2):
                @pl.when((j >= ymin + D) & (j <= ymax + D + 1))
                def _vterm(j=j):
                    wj = jnp.where(y_idx == (j - D), 1.0 - ay2, 0.0)
                    if j >= 1:
                        wj = wj + jnp.where(y_idx == (j - 1 - D), ay2, 0.0)
                    vacc[...] += wj.astype(wdt)[None] * R1[:, j:j + mrows, :]
            v = vacc[...]                           # (5, mrows, wp)

            xmin = jnp.min(xm)
            xmax = jnp.max(xm)
            racc[...] = jnp.zeros_like(racc)
            for j in range(2 * D + 2):
                sh = j - D

                @pl.when((j >= xmin + D) & (j <= xmax + D + 1))
                def _hterm(j=j, sh=sh):
                    wj = jnp.where(xm == sh, 1.0 - axm2, 0.0)
                    if j >= 1:
                        wj = wj + jnp.where(xm == sh - 1, axm2, 0.0)
                    racc[...] += (wj.astype(wdt)[None]
                                  * v[:, :, base + sh:base + sh + mcols])
            R1w = racc[...]                         # (5, mrows, mcols)
        else:
            v = None
            for j in range(2 * D + 2):
                wj = jnp.where(y_idx == (j - D), 1.0 - ay2, 0.0)
                if j >= 1:
                    wj = wj + jnp.where(y_idx == (j - 1 - D), ay2, 0.0)
                t = wj.astype(wdt)[None] * R1[:, j:j + mrows, :]
                v = t if v is None else v + t       # (5, mrows, wp)

            # horizontal: shift within the slab's lane halo. Warped
            # column c (absolute col c - hb in image coords) reads v at
            # c + x_idx.
            R1w = None
            for j in range(2 * D + 2):
                sh = j - D
                wj = jnp.where(xm == sh, 1.0 - axm2, 0.0)
                if j >= 1:
                    wj = wj + jnp.where(xm == sh - 1, axm2, 0.0)
                t = (wj.astype(wdt)[None]
                     * v[:, :, base + sh:base + sh + mcols])
                R1w = t if R1w is None else R1w + t  # (5, mrows, mcols)

    # ---- averaged-matrix normal equations (update_matrices_p) ----
    R1w = R1w.astype(jnp.float32)
    R0 = r0_sl[:, D:D + mrows, hb - bw:hb - bw + w + 2 * bw].astype(
        jnp.float32)
    if "m" in diag_skip:
        # diagnostic knockout: plane sums stand in for the normal
        # equations (keeps R0 and the warp alive)
        a_xx = R0[2] + R1w[2]
        a_yy = R0[3] + R1w[3]
        axy = R0[4] + R1w[4]
        db_x = R0[0] + R1w[0]
        db_y = R0[1] + R1w[1]
    else:
        dxm = dx[:, hb - bw:hb - bw + w + 2 * bw]
        dym = dy[:, hb - bw:hb - bw + w + 2 * bw]
        a_xx = (R0[2] + R1w[2]) * 0.5
        a_yy = (R0[3] + R1w[3]) * 0.5
        axy = (R0[4] + R1w[4]) * 0.25
        db_x = (R0[0] - R1w[0]) * 0.5 + a_xx * dxm + axy * dym
        db_y = (R0[1] - R1w[1]) * 0.5 + axy * dxm + a_yy * dym

    # (a "border_v2" reformulation — column taper as a row-vector multiply
    # + guarded dr^2 row pass — was A/B'd here and measured neutral at
    # bench level; BASELINE.md round-3 session-3 ledger)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (mrows, mcols), 0) \
        + tile_lo
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (mrows, mcols), 1) - bw
    if "border" not in diag_skip and "damp" not in diag_skip:
        # damping varies only along each axis: build the two 1-D tapers
        # and outer-product them — 10 selects on vectors instead of full
        # tiles
        damp = _damp_vec(row_ids[:, 0:1], h) * _damp_vec(col_ids[0:1, :],
                                                         w)
        a_xx = a_xx * damp
        a_yy = a_yy * damp
        axy = axy * damp
        db_x = db_x * damp
        db_y = db_y * damp

    if "m" in diag_skip:
        m0, m1, m2, m3, m4 = a_xx, a_yy, axy, db_x, db_y
    else:
        m0 = a_xx * a_xx + axy * axy
        m1 = (a_xx + a_yy) * axy
        m2 = a_yy * a_yy + axy * axy
        m3 = a_xx * db_x + axy * db_y
        m4 = axy * db_x + a_yy * db_y

    if "border" not in diag_skip:
        # ---- replicate M at the IMAGE borders (XLA parity) ----
        # the reference path computes M only inside the image and
        # box-filters with replicate padding; warping at out-of-image
        # positions gives a different (wrong) M, so overwrite the halo
        # with the edge row/col.
        ir = row_ids[:, 0:1]                      # (mrows, 1) image rows
        ic = col_ids[0:1, :]                      # (1, mcols) image cols
        top_sel = (ir == 0)
        bot_sel = (ir == h - 1)

        def row_fix(ms):
            out = []
            for m in ms:
                top_row = jnp.sum(jnp.where(top_sel, m, 0.0), axis=0,
                                  keepdims=True)
                bot_row = jnp.sum(jnp.where(bot_sel, m, 0.0), axis=0,
                                  keepdims=True)
                m = jnp.where(ir < 0, top_row, m)
                m = jnp.where(ir > h - 1, bot_row, m)
                out.append(m)
            return tuple(out)

        if "rowfix" not in diag_skip:
            if "nocond" in diag_skip:
                # diagnostic variant: unconditional row_fix (measures the
                # lax.cond's own scheduling cost vs the guarded passes)
                m0, m1, m2, m3, m4 = row_fix((m0, m1, m2, m3, m4))
            else:
                # only tiles straddling the image top/bottom have
                # out-of-image M rows to replicate — guard the
                # 5 x (2 reduce + 2 select) passes on a scalar so
                # interior tiles skip them entirely
                at_border = (tile_lo < 0) | (tile_lo + mrows > h)
                m0, m1, m2, m3, m4 = jax.lax.cond(at_border, row_fix,
                                                  lambda ms: ms,
                                                  (m0, m1, m2, m3, m4))

        if "colfix" not in diag_skip:
            def col_fix(m):
                m = jnp.where(ic < 0, m[:, bw:bw + 1], m)
                m = jnp.where(ic > w - 1, m[:, w + bw - 1:w + bw], m)
                return m

            m0, m1, m2, m3, m4 = (col_fix(m)
                                  for m in (m0, m1, m2, m3, m4))

    return _box_solve(th, w, bw, weights, diag_skip,
                      out_ref, (m0, m1, m2, m3, m4), ret=ret)


def _box_solve(th, w, bw, weights, diag_skip, out_ref, ms_in, ret=False):
    """Separable winsize smoothing + 2x2 solve (shared kernel tail).

    (Rejected A/Bs that lived here — BASELINE.md ledgers: bf16 box
    accumulation +1.2% fps but 10x EPE (r3); banded-MXU vertical box
    neutral (r3); 5-plane lane-concatenated box passes -6.5% (r4). The
    box passes are not the kernel's cost.)

    out_ref is (2, th, w) or, from the pair-batched kernel, (1, 2, th, w)
    — written through the shared scalar-leading-index idiom
    (kernels/_store.py — .at[0] views reject on hardware). ret=True
    returns the solved (u, v) values instead (pipelined kernel's
    intermediate iterations store into VMEM rings, not HBM)."""
    if ret:
        assert not diag_skip, "diag knockouts have no return mode"
        _stash = [None, None]

        def _st(c, val):
            _stash[c] = val
    else:
        _st = batched_store(out_ref)
    m0, m1, m2, m3, m4 = ms_in
    taps = 2 * bw + 1
    box_split = weights is None        # uniform box, 3xA factored
    ms = (m0, m1, m2, m3, m4)
    if "box" in diag_skip:
        # diagnostic knockout: center crop stands in for the smoothed M
        g11, g12, g22, h1, h2 = (m[bw:bw + th, bw:bw + w].astype(
            jnp.float32) for m in ms)
        idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
        _st(0, (g22 * h1 - g12 * h2) * idet)
        _st(1, (g11 * h2 - g12 * h1) * idet)
        return
    outs = []
    for m in ms:
        if box_split:
            a = taps // 3
            inv = 1.0 / taps
            # box(3a) = box3 then stride-3 box_a (exact regrouping):
            # 3 + a shifted adds instead of 3a per axis
            s3 = None
            for k in range(3):
                t = m[k:k + th + taps - 3, :]
                s3 = t if s3 is None else s3 + t
            vsum = None
            for j in range(a):
                t = s3[3 * j:3 * j + th, :]
                vsum = t if vsum is None else vsum + t
            s3h = None
            for k in range(3):
                t = vsum[:, k:k + w + taps - 3]
                s3h = t if s3h is None else s3h + t
            hsum = None
            for j in range(a):
                t = s3h[:, 3 * j:3 * j + w]
                hsum = t if hsum is None else hsum + t
            hsum = hsum.astype(jnp.float32) * (inv * inv)
        else:
            # python-float taps stay weak-typed so bf16 operands are not
            # promoted back to f32 by the np.float32 scalars
            vsum = None
            for k in range(taps):
                t = float(weights[k]) * m[k:k + th, :]
                vsum = t if vsum is None else vsum + t
            hsum = None
            for k in range(taps):
                t = float(weights[k]) * vsum[:, k:k + w]
                hsum = t if hsum is None else hsum + t
        outs.append(hsum.astype(jnp.float32))
    g11, g12, g22, h1, h2 = outs
    if "solve" in diag_skip:
        _st(0, h1)
        _st(1, h2)
        return
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    _st(0, (g22 * h1 - g12 * h2) * idet)
    _st(1, (g11 * h2 - g12 * h1) * idet)
    if ret:
        return tuple(_stash)


def fi_geometry(h: int, w: int, winsize: int, max_disp: int,
                tile_h: int, itemsize: int):
    """Tile/padding geometry shared by flow_iter and prep_planes."""
    bw = winsize // 2
    hb = bw + int(max_disp)
    # sublane alignment for the manual HBM->VMEM DMAs: 8 rows for 4-byte
    # dtypes, 16 for bf16 (the packed register tile is (16, 128))
    align = 16 if itemsize < 4 else 8
    th = tile_h or 32
    if th % align != 0:
        # the manual HBM->VMEM DMA offsets are i*th rows: a tile height
        # off the dtype's sublane alignment (8 f32 / 16 bf16) is rejected
        # by Mosaic at compile time ON HARDWARE ONLY — round up here so a
        # KH_FI_TH A/B sweep can't silently produce an uncompilable config
        th = _round_up(th, align)
    th = th if h >= th else _round_up(h, align)
    h_pad = _round_up(h, th)
    rows = _round_up(th + 2 * hb + 1, align)
    extra = rows - (th + 2 * hb)
    wp = _round_up(w + 2 * hb + 1, 128)
    return th, h_pad, rows, extra, wp, hb, bw


def _window_weights(winsize: int, gaussian: bool):
    """winsize-smoothing tap weights shared by flow_iter and
    flow_iter_pairs: the cv2 Gaussian window (sigma = (winsize//2)*0.3),
    None for a 3-divisible uniform box (the kernel then uses the factored
    3xA tap path), or explicit uniform taps otherwise."""
    n = 2 * (winsize // 2) + 1
    if gaussian:
        kern = gaussian_kernel(n, (winsize // 2) * 0.3).astype(np.float64)
        return tuple(np.float32(v) for v in kern)
    if n % 3 == 0:
        return None                 # uniform box: factored 3xA taps
    kern = np.full(n, 1.0 / n, dtype=np.float64)
    return tuple(np.float32(v) for v in kern)


def _flow_iter_pairs_kernel(th: int, w: int, h: int, bw: int, D: int,
                            rows: int, weights, shift_skip,
                            ppc: int, r_hbm, fl_hbm, out_ref,
                            r0_s, r1_s, fl_s, sem, *accs):
    """Pair-batched fused Farneback iteration: grid (B, n_tiles).

    B independent frame pairs share ONE kernel launch — the per-launch
    floor (0.57-0.60 ms/iter at 1080p, ~4.4x the byte roofline;
    BASELINE.md round-3 session-3) amortizes across the whole batch.
    Pair b reads its R0/R1 plane slabs from rows p and p+1 of a SINGLE
    (N, 5, H, W) HBM stack, where p = b + b // ppc when `ppc` (pairs per
    clip) chains multiple clips' frames end to end, else p = b —
    consecutive pairs of a clip share each frame's planes in HBM with no
    duplication. The double-buffered slab pipeline runs over the LINEAR
    step index s = b * n_tiles + i, so the tile-(b, i+1) / pair-(b+1)
    DMAs overlap this step's compute exactly as in the single-pair
    kernel. Per-pair math is the SAME CODE as _flow_iter_kernel — both
    kernels delegate to _tile_body (no diag_skip / band mode here)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(0)
    nt = pl.num_programs(1)
    s = b * nt + i

    def frame_of(bb):
        if ppc > 0:
            return bb + bb // ppc
        return bb

    def copies(bb, step, slot):
        p = frame_of(bb)
        return [
            pltpu.make_async_copy(
                r_hbm.at[p, :, pl.ds(step * th, rows), :],
                r0_s.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(
                r_hbm.at[p + 1, :, pl.ds(step * th, rows), :],
                r1_s.at[slot], sem.at[slot, 1]),
            pltpu.make_async_copy(
                fl_hbm.at[bb, :, pl.ds(step * th, rows), :],
                fl_s.at[slot], sem.at[slot, 2]),
        ]

    @pl.when(s == 0)
    def _start_first():
        for c in copies(0, 0, 0):
            c.start()

    @pl.when(s + 1 < nb * nt)
    def _prefetch_next():
        s1 = s + 1
        for c in copies(s1 // nt, s1 % nt, s1 % 2):
            c.start()

    slot = s % 2
    for c in copies(b, i, slot):
        c.wait()

    mrows = th + 2 * bw
    return _tile_body(th, w, h, bw, D, weights, shift_skip, frozenset(),
                      i * th - bw, r0_s[slot], r1_s[slot],
                      fl_s[slot, :, D:D + mrows, :], out_ref, accs)


@functools.partial(jax.jit, static_argnames=("winsize", "max_disp",
                                             "gaussian", "tile_h",
                                             "interpret", "shift_skip",
                                             "img_hw",
                                             "clip_len"))
def flow_iter_pairs(Rall: jnp.ndarray, flow_b: jnp.ndarray,
                    winsize: int, max_disp: int, img_hw,
                    gaussian: bool = False, tile_h: int = 0,
                    shift_skip: bool = True,
                    clip_len: int = 0,
                    interpret: bool = False) -> jnp.ndarray:
    """One fused Farneback iteration for B independent frame pairs in ONE
    launch (grid (B, n_tiles)) — the launch-amortization lever of
    BASELINE.md round-3 session-3.

    Rall: (N, 5, Hp, Wp) polyexp plane stacks for N frames, PRE-PADDED by
    prep_planes (vmapped) into the slab layout for img_hw = (h, w).
    flow_b: (B, 2, h, w) prior ABSOLUTE flows, one per pair. Pair b uses
    frames (p, p+1) with p = b (single clip, B = N - 1) or
    p = b + b // (clip_len - 1) when `clip_len` = T chains C clips'
    frames as N = C * T (B = C * (T - 1)).
    Returns (B, 2, h, w) new flows. Per-pair numerics identical to
    flow_iter(shift_skip=...).
    """
    h, w = img_hw
    D = int(max_disp)
    B = flow_b.shape[0]
    N = Rall.shape[0]
    ppc = 0
    if clip_len:
        ppc = clip_len - 1
        if B != (N // clip_len) * ppc:
            raise ValueError(f"clip_len={clip_len}: expected "
                             f"{(N // clip_len) * ppc} pairs, got {B}")
    elif B != N - 1:
        raise ValueError(f"expected B = N - 1 = {N - 1} pairs, got {B}")
    weights = _window_weights(winsize, gaussian)

    th, h_pad, rows, extra, wp, hb, bw = fi_geometry(
        h, w, winsize, max_disp, tile_h, Rall.dtype.itemsize)
    if Rall.shape[2:] != (h_pad - h + extra + h + 2 * hb, wp):
        raise ValueError(
            f"pre-padded planes {Rall.shape} do not match fi_geometry for "
            f"img_hw={img_hw}, tile_h={tile_h}")

    def prep(x):
        x = jnp.pad(x, ((0, 0), (hb, hb), (hb, hb)), mode="edge")
        return jnp.pad(x, ((0, 0), (0, h_pad - h + extra),
                           (0, wp - (w + 2 * hb))))

    fl = jax.vmap(prep)(flow_b)

    mrows = th + 2 * bw
    scratch = [
        pltpu.VMEM((2, 5, rows, wp), Rall.dtype),
        pltpu.VMEM((2, 5, rows, wp), Rall.dtype),
        pltpu.VMEM((2, 2, rows, wp), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 3)),
    ]
    if shift_skip:
        scratch += [pltpu.VMEM((5, mrows, wp), jnp.float32),
                    pltpu.VMEM((5, mrows, w + 2 * bw), jnp.float32)]

    out = pl.pallas_call(
        functools.partial(_flow_iter_pairs_kernel, th, w, h, bw, D, rows,
                          weights, shift_skip, ppc),
        grid=(B, h_pad // th),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec((1, 2, th, w), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, h_pad, w), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(Rall, fl)
    return out[:, :, :h, :]


def _flow_iters_pipe_kernel(th: int, w: int, h: int, bw: int, D: int,
                            rows: int, n_iters: int, ntiles: int,
                            weights, shift_skip,
                            r0_hbm, r1_hbm, fl_hbm, out_ref,
                            r0_s, r1_s, fl_s, ring, sem_r, sem_f, *accs):
    """Strip-mined fine-level kernel: ALL n_iters flow iterations in ONE
    launch via a skewed software pipeline (the round-4 verdict's untried
    lever — FIXED per-iteration flow halo, unlike the rejected
    halo-growing cross-iteration fusion, so compute does not amplify).

    Grid step s runs iteration j on band b = s - j for every j in
    [0, n_iters) with 0 <= b < ntiles — the TPU grid is sequential, so
    when iteration j+1 of band b runs at step s = b + j + 1, iteration j
    has already produced bands b-1 (step s-2), b (s-1) and b+1 (s): the
    bw-row flow halo each iteration needs is available from VMEM ring
    buffers and intermediate flows NEVER round-trip to HBM. Each band's
    R0/R1 slabs are DMA'd once into an (n_iters+1)-slot ring and consumed
    by all its iterations (1/n_iters of the per-iteration slab traffic);
    only the final iteration's flow is written out.

    ring: ((n_iters-1)*3, 2, th, wp) f32 — iteration j's band outputs
    live at ring[j*3 + b % 3] in the padded column layout (hb-col edge
    replication + zero tail, identical to prep_planes' flow layout), so
    assembling the next iteration's flm slab is three sublane slices."""
    hb = bw + D
    mrows = th + 2 * bw
    nsl = n_iters + 1
    s = pl.program_id(0)
    wp = r0_s.shape[-1]

    def r_copies(b, slot):
        return [
            pltpu.make_async_copy(r0_hbm.at[:, pl.ds(b * th, rows), :],
                                  r0_s.at[slot], sem_r.at[slot, 0]),
            pltpu.make_async_copy(r1_hbm.at[:, pl.ds(b * th, rows), :],
                                  r1_s.at[slot], sem_r.at[slot, 1]),
        ]

    def f_copy(b, slot):
        return [pltpu.make_async_copy(fl_hbm.at[:, pl.ds(b * th, rows), :],
                                      fl_s.at[slot], sem_f.at[slot])]

    @pl.when(s == 0)
    def _start_first():
        for c in r_copies(0, 0) + f_copy(0, 0):
            c.start()

    @pl.when(s + 1 < ntiles)
    def _prefetch():
        for c in (r_copies(s + 1, (s + 1) % nsl)
                  + f_copy(s + 1, (s + 1) % 2)):
            c.start()

    @pl.when(s < ntiles)
    def _wait():
        for c in r_copies(s, s % nsl) + f_copy(s, s % 2):
            c.wait()

    def assemble(ridx, b):
        """flm (2, mrows, wp) for band b from iteration ridx's ring:
        bw-row tail of band b-1, band b's core, bw-row head of band b+1,
        with edge replication at the image top/bottom (matches what
        prep_planes would produce from the cropped flow)."""
        core = ring[ridx * 3 + b % 3]                       # (2, th, wp)
        prev = ring[ridx * 3 + (b - 1) % 3, :, th - bw:th, :]
        nxt = ring[ridx * 3 + (b + 1) % 3, :, 0:bw, :]
        top = jnp.broadcast_to(core[:, 0:1, :], (2, bw, wp))
        bot = jnp.broadcast_to(core[:, th - 1:th, :], (2, bw, wp))
        prev = jnp.where(b > 0, prev, top)
        nxt = jnp.where(b + 1 < ntiles, nxt, bot)
        flm = jnp.concatenate([prev, core, nxt], axis=1)    # (2,mrows,wp)
        # rows at/below the image bottom replicate image row h-1 (the
        # cropped-flow re-pad semantics); only the last band can have
        # such rows, and the select-sum row extraction is cheap
        grow = (jax.lax.broadcasted_iota(jnp.int32, (1, mrows, 1), 1)
                + b * th - bw)
        rh = jnp.sum(jnp.where(grow == h - 1, flm, 0.0), axis=1,
                     keepdims=True)
        return jnp.where(grow > h - 1, rh, flm)

    def pad_cols(u):
        """(th, w) core -> (th, wp) padded columns (hb edge + zero tail,
        prep_planes' column layout)."""
        left = jnp.broadcast_to(u[:, 0:1], (th, hb))
        right = jnp.broadcast_to(u[:, w - 1:w], (th, hb))
        tail = jnp.zeros((th, wp - w - 2 * hb), jnp.float32)
        return jnp.concatenate([left, u, right, tail], axis=1)

    for j in range(n_iters):
        @pl.when((s >= j) & (s - j < ntiles))
        def _phase(j=j):
            b = s - j
            rsl = b % nsl
            if j == 0:
                flm = fl_s[b % 2, :, D:D + mrows, :]
            else:
                flm = assemble(j - 1, b)
            res = _tile_body(th, w, h, bw, D, weights, shift_skip,
                             frozenset(), b * th - bw,
                             r0_s[rsl], r1_s[rsl], flm,
                             out_ref if j == n_iters - 1 else None,
                             accs, ret=j < n_iters - 1)
            if j < n_iters - 1:
                u, v = res
                ring[j * 3 + b % 3, 0] = pad_cols(u)
                ring[j * 3 + b % 3, 1] = pad_cols(v)


@functools.partial(jax.jit, static_argnames=("winsize", "max_disp",
                                             "n_iters", "gaussian",
                                             "tile_h", "shift_skip",
                                             "img_hw", "interpret"))
def flow_iters_pipelined(R0p: jnp.ndarray, R1p: jnp.ndarray,
                         flow_p: jnp.ndarray, winsize: int, max_disp: int,
                         n_iters: int, img_hw, gaussian: bool = False,
                         tile_h: int = 0, shift_skip: bool = True,
                         interpret: bool = False) -> jnp.ndarray:
    """All `n_iters` fused Farneback iterations of one level in ONE
    kernel launch (skewed pipeline — see _flow_iters_pipe_kernel).
    Per-iteration numerics identical to flow_iter; R0p/R1p arrive
    PRE-PADDED by prep_planes. Returns (2, h, w) new absolute flow."""
    if n_iters < 2:
        raise ValueError("flow_iters_pipelined needs n_iters >= 2 "
                         "(use flow_iter for a single iteration)")
    h, w = img_hw
    D = int(max_disp)
    weights = _window_weights(winsize, gaussian)
    th, h_pad, rows, extra, wp, hb, bw = fi_geometry(
        h, w, winsize, max_disp, tile_h, R0p.dtype.itemsize)
    if R0p.shape[1:] != (h_pad - h + extra + h + 2 * hb, wp):
        raise ValueError(
            f"pre-padded planes {R0p.shape} do not match fi_geometry for "
            f"img_hw={img_hw}, tile_h={tile_h}")

    def prep(x):
        x = jnp.pad(x, ((0, 0), (hb, hb), (hb, hb)), mode="edge")
        return jnp.pad(x, ((0, 0), (0, h_pad - h + extra),
                           (0, wp - (w + 2 * hb))))

    fl = prep(flow_p)
    ntiles = h_pad // th
    mrows = th + 2 * bw
    nsl = n_iters + 1
    scratch = [
        pltpu.VMEM((nsl, 5, rows, wp), R0p.dtype),
        pltpu.VMEM((nsl, 5, rows, wp), R1p.dtype),
        pltpu.VMEM((2, 2, rows, wp), jnp.float32),
        pltpu.VMEM(((n_iters - 1) * 3, 2, th, wp), jnp.float32),
        pltpu.SemaphoreType.DMA((nsl, 2)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if shift_skip:
        scratch += [pltpu.VMEM((5, mrows, wp), jnp.float32),
                    pltpu.VMEM((5, mrows, w + 2 * bw), jnp.float32)]

    K = n_iters - 1
    out = pl.pallas_call(
        functools.partial(_flow_iters_pipe_kernel, th, w, h, bw, D, rows,
                          n_iters, ntiles, weights, shift_skip),
        grid=(ntiles + K,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec((2, th, w),
                               lambda s: (0, jnp.maximum(s - K, 0), 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, h_pad, w), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(R0p, R1p, fl)
    return out[:, :h, :]


@functools.partial(jax.jit, static_argnames=("winsize", "max_disp",
                                             "tile_h"))
def prep_planes(R: jnp.ndarray, winsize: int, max_disp: int,
                tile_h: int = 0) -> jnp.ndarray:
    """Edge+zero-pad polyexp planes into flow_iter's slab layout ONCE.

    The padded result can be passed to flow_iter(img_hw=(h, w)) for
    every iteration of a level — the planes are iteration-invariant, so
    re-padding them inside each call wasted ~2/3 of the per-frame XLA
    pad traffic (BASELINE.md round-3 session-3)."""
    _, h, w = R.shape
    th, h_pad, rows, extra, wp, hb, bw = fi_geometry(
        h, w, winsize, max_disp, tile_h, R.dtype.itemsize)
    x = jnp.pad(R, ((0, 0), (hb, hb), (hb, hb)), mode="edge")
    return jnp.pad(x, ((0, 0), (0, h_pad - h + extra),
                       (0, wp - (w + 2 * hb))))


@functools.partial(jax.jit, static_argnames=("winsize", "max_disp",
                                             "gaussian", "tile_h",
                                             "interpret", "img_h",
                                             "shift_skip", "img_hw",
                                             "diag_skip"))
def flow_iter(R0p: jnp.ndarray, R1p: jnp.ndarray, flow_p: jnp.ndarray,
              winsize: int, max_disp: int, gaussian: bool = False,
              tile_h: int = 0, interpret: bool = False,
              row0=None, img_h: int = 0,
              shift_skip: bool = False,
              img_hw=None,
              diag_skip: str = "") -> jnp.ndarray:
    """One fused Farneback iteration (warp included).

    R0p, R1p: (5, H, W) UNWARPED polyexp planes (f32 or bf16 storage —
    bf16 slabs halve the DMA bytes and are warped/accumulated in f32);
    flow_p: (2, H, W) prior flow. max_disp: the select-sum displacement
    clamp (FlowConfig.fast_warp). Returns (2, H, W) new absolute flow.
    Matches update_matrices_p(fast_warp=max_disp) + update_flow_p.

    tile_h: grid row-tile height (0 = default). Larger tiles amortize the
    (bw + max_disp)-row halo recompute at the cost of VMEM (A/B'd on v5e:
    see BASELINE.md).

    row0 / img_h: spatially-sharded band mode (parallel/spatial
    farneback_sharded with impl="pallas") — the inputs are a LOCAL row
    slab of a globally img_h-tall image whose row 0 sits at traced global
    row `row0`; border damping and M edge replication then use global
    coordinates. Requires tile height >= winsize//2 + max_disp + 1 so
    the global top border falls in grid step 0 (default th=32 is fine).
    """
    if img_hw is not None:
        # R0p/R1p arrive PRE-PADDED by prep_planes (pad once per level,
        # not once per iteration); flow_p is unpadded as usual
        h, w = img_hw
    else:
        _, h, w = R0p.shape
    D = int(max_disp)
    weights = _window_weights(winsize, gaussian)

    th, h_pad, rows, extra, wp, hb, bw = fi_geometry(
        h, w, winsize, max_disp, tile_h, R0p.dtype.itemsize)

    def prep(x):
        x = jnp.pad(x, ((0, 0), (hb, hb), (hb, hb)), mode="edge")
        return jnp.pad(x, ((0, 0), (0, h_pad - h + extra),
                           (0, wp - (w + 2 * hb))))

    if img_hw is not None:
        r0, r1 = R0p, R1p
        if r0.shape[1:] != (h_pad - h + extra + h + 2 * hb, wp):
            raise ValueError(
                f"pre-padded planes {r0.shape} do not match the "
                f"fi_geometry for img_hw={img_hw}, tile_h={tile_h}")
    else:
        r0 = prep(R0p)
        r1 = prep(R1p)
    fl = prep(flow_p)

    has_row0 = row0 is not None
    if has_row0 and img_h <= 0:
        raise ValueError("band mode (row0 given) requires img_h = the "
                         "GLOBAL image height")
    if has_row0 and th < bw + D + 1:
        # grid step 0's M region must reach global image row 0 (the
        # top/bottom row_fix select-sums replicate garbage otherwise)
        raise ValueError(
            f"band mode requires tile_h >= winsize//2 + max_disp + 1 "
            f"(= {bw + D + 1}); got tile_h={th}")
    hg = img_h if has_row0 else h
    inputs = (r0, r1, fl)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * len(inputs)
    if has_row0:
        # row0 = GLOBAL image row of the caller's input row 0: the kernel
        # computes local row ids exactly as in single-device mode and
        # adds this offset, so damping/edge replication see global coords
        inputs += (jnp.asarray(row0, jnp.int32).reshape(1),)
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]

    mrows = th + 2 * bw
    scratch = [
        pltpu.VMEM((2, 5, rows, wp), R0p.dtype),
        pltpu.VMEM((2, 5, rows, wp), R1p.dtype),
        pltpu.VMEM((2, 2, rows, wp), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 3)),
    ]
    if shift_skip:
        scratch += [pltpu.VMEM((5, mrows, wp), jnp.float32),
                    pltpu.VMEM((5, mrows, w + 2 * bw), jnp.float32)]

    # diag_skip: comma-separated phase knockouts for perf decomposition
    # ("dma", "warp", "m", "border", "box", "solve") — WRONG OUTPUTS by
    # design, used only by tools/fi_phase_ab.py. Each knockout keeps the
    # upstream dataflow alive so the remaining phases are not DCE'd.
    dsk = frozenset(t for t in diag_skip.split(",") if t)
    out = pl.pallas_call(
        functools.partial(_flow_iter_kernel, th, w, hg, bw, D, rows,
                          weights, has_row0, shift_skip, dsk),
        grid=(h_pad // th,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, th, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, h_pad, w), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    return out[:, :h, :]
