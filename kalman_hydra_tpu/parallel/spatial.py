"""Spatial frame sharding: dense flow with row-band partitioning + halo
exchange (SURVEY.md §2.2 — the tensor-parallel / ring-attention analog for
this workload).

A frame's rows are sharded across the mesh; every windowed op needs only a
fixed-width band of neighbor rows, so each stage exchanges halos with
`lax.ppermute` over ICI instead of gathering the full frame. Use when a
single frame no longer fits (or saturates) one chip; at 1080p on v5e this
is optional (SURVEY.md §1.2) but the mechanism is exercised in tests on the
fake 8-device CPU mesh.

Implemented pipeline: spatially-sharded dense pyramidal LK
(`lk_dense_sharded`) — pyrDown, Scharr gradients, window sums and the
warp are all local given halos; the warp's vertical displacement is
clamped to the halo width (documented semantic bound, default 8 px/level,
well above per-level LK updates).

Design note — spatially-sharded Farneback (not yet implemented; optional
per SURVEY.md §2.2 since one chip already exceeds the 5x target 24-fold):
the blur/polyexp/box stages shard exactly like LK (fixed halos 39/11/7
rows at 1080p/8, all < the 135-row local band), but cv2's cvRound level
sizes (1080 -> 540 -> 270 -> 135 -> 68 -> 34) stop dividing by the mesh at
level 3. The plan is a mixed pyramid: levels with H_l % n == 0 and
H_l/n >= halo stay row-sharded; coarser levels all_gather once and compute
replicated (they are <6%% of the pixels). The x2 flow upsample at the
sharded/replicated boundary is a single dynamic-slice per device.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import FlowConfig
from ..ops import lk as lk_ops
from ..ops.filters import correlate1d
from ..ops.pyramid import resize_linear

_PYR_K = np.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=np.float32) / 16.0


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str,
                  pad_mode: str = "edge") -> jnp.ndarray:
    """Extend a row-sharded block with `halo` rows from each neighbor.

    x: (h_local, ...) block on each device. Edge devices synthesize the
    missing halo with `pad_mode` ('edge' = replicate, 'reflect' =
    REFLECT_101) so global border semantics match the unsharded op.
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    down = [(i, (i + 1) % n) for i in range(n)]   # send to next (row-below)
    up = [(i, (i - 1) % n) for i in range(n)]     # send to previous

    from_above = lax.ppermute(x[-halo:], axis_name, perm=down)
    from_below = lax.ppermute(x[:halo], axis_name, perm=up)

    pads = [(halo, halo)] + [(0, 0)] * (x.ndim - 1)
    x_pad = jnp.pad(x, pads, mode=pad_mode)
    top_is_edge = idx == 0
    bot_is_edge = idx == n - 1
    top = jnp.where(top_is_edge, x_pad[:halo], from_above)
    bot = jnp.where(bot_is_edge, x_pad[-halo:], from_below)
    return jnp.concatenate([top, x, bot], axis=0)


def _pyr_down_local(block: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Sharded cv2.pyrDown: 2-row halo exchange + local blur/decimate.

    Requires the local block height to be even (global H divisible by
    2^levels * n_devices), keeping decimation globally aligned.
    """
    ext = halo_exchange(block, 2, axis_name, pad_mode="reflect")
    v = None
    for k, wk in enumerate(_PYR_K):
        sl = ext[k:k + block.shape[0], :]
        t = wk * sl
        v = t if v is None else v + t
    v = v[::2]
    h = correlate1d(v, _PYR_K, axis=-1, border="reflect101")
    return h[:, ::2]


def _scharr_local(block, axis_name):
    ext = halo_exchange(block, 1, axis_name, pad_mode="edge")
    gx_full = correlate1d(ext, lk_ops._SCHARR_EDGE, axis=-1,
                          border="replicate")
    gx = None
    for k, wk in enumerate(lk_ops._SCHARR_SMOOTH):
        t = wk * gx_full[k:k + block.shape[0], :]
        gx = t if gx is None else gx + t
    gy_s = correlate1d(ext, lk_ops._SCHARR_SMOOTH, axis=-1,
                       border="replicate")
    gy = (gy_s[2:2 + block.shape[0], :] - gy_s[0:block.shape[0], :]) \
        * np.float32(1.0)
    # vertical edge kernel [-1, 0, 1]: (row+1) - (row-1)
    return gx, gy


def _wsum_local(v, w, axis_name):
    """winsize box sums with halo exchange for the vertical pass."""
    r = w // 2
    ext = halo_exchange(v, r, axis_name, pad_mode="edge")
    acc = None
    for k in range(w):
        t = ext[k:k + v.shape[0], :]
        acc = t if acc is None else acc + t
    hp = jnp.pad(acc, ((0, 0), (r, r)), mode="edge")
    out = None
    for k in range(w):
        t = hp[:, k:k + v.shape[1]]
        out = t if out is None else out + t
    return out


def _warp_local(img_block, flow, axis_name, halo: int):
    """Backward warp with vertical displacement clamped to +-halo rows."""
    ext = halo_exchange(img_block, halo, axis_name, pad_mode="edge")
    hb, wb = img_block.shape
    ys = jnp.arange(hb, dtype=jnp.float32)[:, None] + halo
    xs = jnp.arange(wb, dtype=jnp.float32)[None, :]
    fy = jnp.clip(flow[..., 1], -halo, halo) + ys
    fx = jnp.clip(xs + flow[..., 0], 0.0, wb - 1.0)
    fy = jnp.clip(fy, 0.0, hb + 2 * halo - 1.0)
    x0 = jnp.clip(jnp.floor(fx), 0, wb - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(fy), 0, hb + 2 * halo - 2).astype(jnp.int32)
    ax = fx - x0
    ay = fy - y0
    i00 = ext[y0, x0]
    i01 = ext[y0, x0 + 1]
    i10 = ext[y0 + 1, x0]
    i11 = ext[y0 + 1, x0 + 1]
    return (i00 * (1 - ax) * (1 - ay) + i01 * ax * (1 - ay)
            + i10 * (1 - ax) * ay + i11 * ax * ay)


def _lk_dense_block(a_block, b_block, cfg: FlowConfig, axis_name: str,
                    warp_halo: int):
    """Per-device dense LK on a row band (runs under shard_map)."""
    w = cfg.lk_winsize
    pyr_a = [a_block]
    pyr_b = [b_block]
    for _ in range(cfg.levels - 1):
        pyr_a.append(_pyr_down_local(pyr_a[-1], axis_name))
        pyr_b.append(_pyr_down_local(pyr_b[-1], axis_name))

    flow = None
    for lvl in range(cfg.levels - 1, -1, -1):
        ia, ib = pyr_a[lvl], pyr_b[lvl]
        hb, wb = ia.shape
        if flow is None:
            # mark the zero init as varying over the mesh axis so the
            # fori_loop carry type matches the (device-varying) body output
            flow = lax.pcast(jnp.zeros((hb, wb, 2), jnp.float32),
                             (axis_name,), to="varying")
        else:
            # seam-free x2 upsample: 1-row halo so boundary output rows
            # interpolate across the device split exactly like the global op
            hp = flow.shape[0]
            ext = halo_exchange(flow, 1, axis_name, pad_mode="edge")
            up = resize_linear(ext, 2 * (hp + 2), wb)
            flow = up[2:2 + 2 * hp] * 2.0
        gx, gy = _scharr_local(ia, axis_name)
        gxx, gxy, gyy = gx * gx, gx * gy, gy * gy
        g11 = _wsum_local(gxx, w, axis_name)
        g12 = _wsum_local(gxy, w, axis_name)
        g22 = _wsum_local(gyy, w, axis_name)
        det = g11 * g22 - g12 * g12
        min_eig = ((g11 + g22)
                   - jnp.sqrt((g11 - g22) ** 2 + 4.0 * g12 ** 2)) \
            * 0.5 / (w * w)
        ok = (min_eig > cfg.lk_min_eig) & (det > 1e-12)
        inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)

        def body(_i, fl):
            warped = _warp_local(ib, fl, axis_name, warp_halo)
            diff = warped - ia
            ux, uy = fl[..., 0], fl[..., 1]
            h1 = _wsum_local(gxx * ux + gxy * uy - diff * gx, w, axis_name)
            h2 = _wsum_local(gxy * ux + gyy * uy - diff * gy, w, axis_name)
            nx = (g22 * h1 - g12 * h2) * inv_det
            ny = (g11 * h2 - g12 * h1) * inv_det
            new = jnp.stack([nx, ny], axis=-1)
            return jnp.where(ok[..., None], new, fl)

        flow = lax.fori_loop(0, cfg.lk_max_iter, body, flow)
    return flow


def lk_dense_sharded(prev: np.ndarray, nxt: np.ndarray, cfg: FlowConfig,
                     mesh: Optional[Mesh] = None, axis: str = "space",
                     warp_halo: int = 8) -> np.ndarray:
    """Dense pyramidal LK with frame rows sharded across the mesh.

    H must be divisible by n_devices * 2^(levels-1). Returns (H, W, 2).
    """
    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), (axis,))
    n = mesh.size
    h = prev.shape[0]
    div = n * 2 ** (cfg.levels - 1)
    if h % div != 0:
        raise ValueError(f"H={h} must be divisible by {div} "
                         f"(devices * 2^(levels-1))")
    # single-hop halo exchange: every level's local block must hold the
    # widest halo (window radius / warp clamp). Shard fewer devices, fewer
    # levels, or a smaller window otherwise.
    coarsest_local = h // div
    max_halo = max(cfg.lk_winsize // 2, warp_halo, 2)
    if coarsest_local < max_halo:
        raise ValueError(
            f"coarsest local rows {coarsest_local} < max halo {max_halo}; "
            f"reduce devices/levels or winsize (single-hop halo exchange)")

    fn = jax.shard_map(
        functools.partial(_lk_dense_block, cfg=cfg, axis_name=axis,
                          warp_halo=warp_halo),
        mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P(axis))
    a = jax.device_put(jnp.asarray(prev, jnp.float32),
                       NamedSharding(mesh, P(axis)))
    b = jax.device_put(jnp.asarray(nxt, jnp.float32),
                       NamedSharding(mesh, P(axis)))
    return np.asarray(jax.jit(fn)(a, b))
