"""Pallas-TPU fused Scharr-gradient kernel: both pyrLK derivative planes
in one pass.

TPU-native piece of the sparse-LK front-end (SURVEY.md §2.1 #6: the
`calcOpticalFlowPyrLK` obligations include its Scharr/32 derivative
convention, see ops/lk.scharr_gradients). The XLA twin runs four
correlate1d passes (2 per gradient), each with its own replicate-pad HBM
copy; this kernel DMAs one 2-row-halo slab per row tile and emits gx and
gy together:

    gx = smooth_y([-1, 0, 1]_x f),   gy = edge_y([3, 10, 3]/32_x f)

with smooth = [3, 10, 3]/32 and edge = [-1, 0, 1], replicate borders.
One HBM read + one (2, H, W) write instead of ~4 reads + 6 writes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_S = (3.0 / 32.0, 10.0 / 32.0, 3.0 / 32.0)   # smoothing taps
_E = (-1.0, 0.0, 1.0)                        # edge taps


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _scharr_kernel(th: int, w: int, rows: int, in_hbm, out_ref,
                   scratch, sem):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(in_hbm.at[pl.ds(i * th, rows), :],
                                scratch, sem)
    dma.start()
    dma.wait()
    s = scratch[:]                              # (rows, wp); halo = 1 px

    # horizontal passes over the full slab height (vertical consumers
    # need the +-1 row halo), then vertical taps at the tile rows
    def hpass(taps):
        acc = None
        for k, tk in enumerate(taps):
            if tk == 0.0:
                continue
            t = tk * s[:, k:k + w]
            acc = t if acc is None else acc + t
        return acc                              # (rows, w)

    ex = hpass(_E)                              # edge in x
    sx = hpass(_S)                              # smooth in x

    def vpass(src, taps):
        acc = None
        for k, tk in enumerate(taps):
            if tk == 0.0:
                continue
            t = tk * src[k:k + th, :]
            acc = t if acc is None else acc + t
        return acc                              # (th, w)

    out_ref[0, :, :] = vpass(ex, _S)            # gx
    out_ref[1, :, :] = vpass(sx, _E)            # gy


@functools.partial(jax.jit, static_argnames=("interpret",))
def scharr_gradients(img: jnp.ndarray, interpret: bool = False):
    """Fused twin of ops.lk.scharr_gradients: (H, W) f32 -> (gx, gy)."""
    h, w = img.shape
    th = min(256, _round_up(h, 8))
    h_pad = _round_up(h, th)
    rows = _round_up(th + 2, 8)
    wp = _round_up(w + 2, 128)

    xp = jnp.pad(img.astype(jnp.float32), ((1, 1), (1, 1)), mode="edge")
    xp = jnp.pad(xp, ((0, h_pad - h + rows - (th + 2)),
                      (0, wp - (w + 2))))

    out = pl.pallas_call(
        functools.partial(_scharr_kernel, th, w, rows),
        grid=(h_pad // th,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((2, th, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, h_pad, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xp)
    return out[0, :h, :], out[1, :h, :]
