"""Pallas-TPU fused pyramid-level kernel: 5-tap binomial blur + 2x decimate.

TPU-native equivalent of OpenCV's C++ `pyrDown` (SURVEY.md §2.1 #6 native
obligation). One kernel pass per level: row-tiled grid; each step DMAs its
input slab (tile rows x full width, plus 4-row halo) from HBM to VMEM,
does both separable passes and both decimations in registers/VMEM, and
writes the (tile/2 x W/2) output block. The input is pre-padded
REFLECT_101 by XLA (fused into the producer), so the kernel needs no
border logic and every DMA offset is a plain multiple of the tile size.

vs XLA: one HBM read + one write per level (the fused blur+decimate never
materializes the intermediate blurred image).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_W5 = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


def _pyr_kernel(th_out: int, w_out: int,
                in_hbm, out_ref, scratch, sem):
    i = pl.program_id(0)
    rows_in = 2 * th_out + 4
    dma = pltpu.make_async_copy(
        in_hbm.at[pl.ds(i * 2 * th_out, rows_in), :],
        scratch, sem)
    dma.start()
    dma.wait()

    s = scratch[:]                       # (2*th+4, wp) with wp = 2*w_out+4
    # vertical blur at even rows only: v[r] = sum_k w_k s[2r+k]
    # (stride-2 slices: reshape-based decimation is an unsupported Mosaic
    # shape cast)
    v = None
    for k, wk in enumerate(_W5):
        sl = jax.lax.slice(s, (k, 0), (k + 2 * th_out, s.shape[1]), (2, 1))
        term = wk * sl
        v = term if v is None else v + term
    # horizontal blur at even cols: h[c] = sum_k w_k v[:, 2c+k]
    out = None
    for k, wk in enumerate(_W5):
        sl = jax.lax.slice(v, (0, k), (th_out, k + 2 * w_out), (1, 2))
        term = wk * sl
        out = term if out is None else out + term
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("interpret",))
def pyr_down(img: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """cv2.pyrDown twin (Pallas). img: (H, W) float32."""
    h, w = img.shape
    oh, ow = (h + 1) // 2, (w + 1) // 2

    # REFLECT_101 pad by 2, plus zero-pad up to tile multiples
    xp = jnp.pad(img, ((2, 2), (2, 2)), mode="reflect")
    th_out = min(128, oh)
    oh_pad = ((oh + th_out - 1) // th_out) * th_out
    need_rows = 2 * oh_pad + 4
    need_cols = 2 * ow + 4
    xp = jnp.pad(xp, ((0, need_rows - xp.shape[0]),
                      (0, max(0, need_cols - xp.shape[1]))))

    grid = (oh_pad // th_out,)
    out = pl.pallas_call(
        functools.partial(_pyr_kernel, th_out, ow),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((th_out, ow), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((oh_pad, ow), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * th_out + 4, need_cols), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp)
    return out[:oh]
