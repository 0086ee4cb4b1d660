"""Mesh-render observation channel (the reference's renderer analog).

The reference's observation model rendered the TEXTURED DEFORMED MESH with
OpenGL and compared it against the observed frame, with CUDA kernels
computing residual norms and J^T z products by perturb-render-diff
(SURVEY.md §2.1 #3/#4; the reference checkout is empty — see SURVEY.md §0 —
so this follows the [R]-tier reconstruction + the BASELINE.json:5 contract).

TPU-native redesign: instead of rasterizing the deformed mesh forward (a
scatter, which TPUs hate), the OBSERVED frame is pulled back to the rest
(template) frame through the piecewise-affine mesh warp:

    q(p; V) = sum_m bary_m(p) * v_{tri(p), m}      (rest pixel p -> image)
    I_w(p)  = I_obs(q(p; V))                        (one bilinear gather)
    r(p)    = T(p) - I_w(p)                         (render residual)

The pixel->triangle assignment and barycentric weights are computed ONCE on
host at template build time (static arrays), so the per-frame cost is one
(P,)-point gather + VPU reductions — no rasterization, no scatter. The
Jacobian is closed-form (dI_w/dv_k = grad I(q) * bary_k), and the per-vertex
Gauss-Newton normal equations are segment-sums over the template pixels.
Unlike the independent-patch photometric channel (models/photometric.py),
this couples vertices through shared triangles and models DEFORMATION of
the appearance — patch templates break under rotation/stretch, the mesh
render does not (tested in test_render.py).

The EKF sees the converged Gauss-Newton position as a per-vertex position
measurement with covariance R_k = sigma_I^2 * G_k^{-1} (low-texture regions
automatically get large R). `render_jtz` exposes the matrix-free J^T r
product through JAX VJP — the autodiff replacement for the reference's
perturb-render-diff CUDA kernels.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import EkfConfig
from ..ops.warp import bilinear_sample
from .photometric import _image_gradients

_PREC = jax.lax.Precision.HIGHEST


class RenderTemplate(NamedTuple):
    """Host-precomputed rest-frame rasterization of a BodyMesh.

    tri   (P, 3) int32   vertex ids of each template pixel's triangle
    bary  (P, 3) float32 barycentric weights of the pixel in its triangle
    tvals (P,)   float32 template intensities (frame-0 gray at the pixel)
    rest  (V, 2) float32 rest vertex positions (mesh.vertices)
    pix   (P, 2) float32 template pixel centers (x, y) — q(pix; rest) == pix
    """

    tri: jnp.ndarray
    bary: jnp.ndarray
    tvals: jnp.ndarray
    rest: jnp.ndarray
    pix: jnp.ndarray


def make_template(gray0: np.ndarray, mesh, max_pixels: int = 0,
                  eps: float = 1e-6) -> RenderTemplate:
    """Rasterize the rest mesh over frame 0 (host, NumPy).

    Every pixel whose center lies inside a mesh triangle becomes a template
    sample; pixels on shared edges go to the first triangle that claims
    them. `max_pixels > 0` subsamples the template with a uniform stride
    (cheaper channel, same estimator — weights just get sparser).
    """
    gray0 = np.asarray(gray0, np.float32)
    h, w = gray0.shape
    verts = np.asarray(mesh.vertices, np.float64)
    tris = np.asarray(mesh.triangles, np.int32)
    tri_id = np.full((h, w), -1, np.int32)
    bar = np.zeros((h, w, 3), np.float32)
    for t, (ia, ib, ic) in enumerate(tris):
        a, b, c = verts[ia], verts[ib], verts[ic]
        x0 = max(int(np.floor(min(a[0], b[0], c[0]))), 0)
        x1 = min(int(np.ceil(max(a[0], b[0], c[0]))) + 1, w)
        y0 = max(int(np.floor(min(a[1], b[1], c[1]))), 0)
        y1 = min(int(np.ceil(max(a[1], b[1], c[1]))) + 1, h)
        if x0 >= x1 or y0 >= y1:
            continue
        yy, xx = np.mgrid[y0:y1, x0:x1]
        dx = xx - a[0]
        dy = yy - a[1]
        m00, m01 = b[0] - a[0], c[0] - a[0]
        m10, m11 = b[1] - a[1], c[1] - a[1]
        det = m00 * m11 - m01 * m10
        if abs(det) < 1e-9:
            continue
        u = (m11 * dx - m01 * dy) / det
        v = (-m10 * dx + m00 * dy) / det
        inside = (u >= -eps) & (v >= -eps) & (u + v <= 1.0 + eps)
        sub = tri_id[y0:y1, x0:x1]
        put = inside & (sub < 0)
        sub[put] = t
        bw = np.stack([1.0 - u - v, u, v], axis=-1).astype(np.float32)
        bar[y0:y1, x0:x1][put] = bw[put]
    ys, xs = np.nonzero(tri_id >= 0)
    if len(xs) == 0:
        raise ValueError("mesh covers no pixels — cannot build a render "
                         "template")
    if max_pixels > 0 and len(xs) > max_pixels:
        stride = int(np.ceil(len(xs) / max_pixels))
        ys, xs = ys[::stride], xs[::stride]
    tri = tris[tri_id[ys, xs]]
    bary = bar[ys, xs]
    tvals = gray0[ys, xs]
    pix = np.stack([xs, ys], axis=-1).astype(np.float32)
    return RenderTemplate(tri=jnp.asarray(tri), bary=jnp.asarray(bary),
                          tvals=jnp.asarray(tvals),
                          rest=jnp.asarray(verts.astype(np.float32)),
                          pix=jnp.asarray(pix))


# ------------------------------------------------------------- warp core

def warp_to_rest(gray: jnp.ndarray, verts: jnp.ndarray,
                 tmpl: RenderTemplate) -> jnp.ndarray:
    """Pull the observed frame back to the rest frame: I_w (P,).

    Differentiable in `verts` (bilinear gather of a gather), so JAX VJP
    through this IS the matrix-free Jacobian product the reference
    computed with CUDA perturb-render-diff kernels.
    """
    vt = verts[tmpl.tri]                                   # (P, 3, 2)
    q = jnp.einsum("pm,pmc->pc", tmpl.bary, vt, precision=_PREC)
    return bilinear_sample(gray, q[:, 0], q[:, 1])


def render_residual(gray: jnp.ndarray, verts: jnp.ndarray,
                    tmpl: RenderTemplate) -> jnp.ndarray:
    """r = T - I_w(verts): the render residual over template pixels."""
    return tmpl.tvals - warp_to_rest(gray, verts, tmpl)


def render_loss(gray: jnp.ndarray, verts: jnp.ndarray,
                tmpl: RenderTemplate) -> jnp.ndarray:
    """0.5 * ||r||^2 — the photometric energy of the mesh configuration."""
    r = render_residual(gray, verts, tmpl)
    return 0.5 * jnp.sum(r * r)


def render_jtz(gray: jnp.ndarray, verts: jnp.ndarray,
               tmpl: RenderTemplate) -> jnp.ndarray:
    """Matrix-free J^T r product, J = dI_w/dverts — the TPU/autodiff
    equivalent of the reference's CUDA J^T z kernels (SURVEY.md §2.1 #4):
    one VJP through the differentiable warp instead of V*2 perturbed
    re-renders. Equals -grad(render_loss) since r = T - I_w."""
    return -jax.grad(render_loss, argnums=1)(gray, verts, tmpl)


# -------------------------------------------------- Gauss-Newton channel

def render_measure(gray: jnp.ndarray, tmpl: RenderTemplate,
                   v_pred: jnp.ndarray, cfg: EkfConfig
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-vertex position measurement from the render residual.

    Block-diagonal (per-vertex) Gauss-Newton on 0.5*||T - I_w(V)||^2,
    started at the EKF-predicted vertex positions, with ROW-SUM LUMPING of
    the normal matrix: the full mesh J^T J couples the vertices of every
    shared triangle; keeping only its w^2 diagonal makes Jacobi sweeps
    overshoot ~3x (sum w / sum w^2 for barycentric weights). Because the
    weights are a partition of unity (sum_m w_m = 1), the row-lumped
    diagonal is G_k = sum_p w_k grad I grad I^T — the FEM lumped-mass
    trick — which recovers any uniform displacement in ONE exact step and
    leaves only the non-uniform residual to the sweeps. Returns
    (z (V, 2), Rk (V, 2, 2) Gauss-Newton covariance, valid (V,)).
    """
    V = tmpl.rest.shape[0]
    h, w = gray.shape
    gx, gy = _image_gradients(gray)
    ids = tmpl.tri.reshape(-1)
    w1 = tmpl.bary                                         # (P, 3)

    # TPU gathers/scatters are per-index bound, payload width nearly free
    # (BASELINE.md warp shootout): stack [gray, gx, gy] into one (H*W, 3)
    # row-gather per sweep instead of three bilinear gathers, and batch
    # the five normal-equation reductions into one (3P, 5) segment-sum —
    # ~4x fewer indices per sweep, bit-identical per-element math.
    planes = jnp.stack([gray, gx, gy], axis=-1).reshape(h * w, 3)

    def samp3(q):
        # shared stacked-plane gather (single owner of border semantics)
        from ..ops.warp import bilinear_sample_rows
        out = bilinear_sample_rows(planes, h, w, q[:, 0], q[:, 1])
        return out[:, 0], out[:, 1], out[:, 2]

    def seg(per_pixel, wgt):
        """Scatter (P,) pixel values * (P,3) weights onto vertices."""
        return jax.ops.segment_sum((wgt * per_pixel[:, None]).reshape(-1),
                                   ids, num_segments=V)

    def gn_iter(v):
        vt = v[tmpl.tri]
        q = jnp.einsum("pm,pmc->pc", w1, vt, precision=_PREC)
        I, gxp, gyp = samp3(q)
        r = tmpl.tvals - I
        data = jnp.stack([gxp * gxp, gxp * gyp, gyp * gyp,
                          gxp * r, gyp * r], axis=-1)      # (P, 5)
        sums = jax.ops.segment_sum(
            (w1[:, :, None] * data[:, None, :]).reshape(-1, 5),
            ids, num_segments=V)                           # (V, 5)
        Gxx, Gxy, Gyy, bx, by = (sums[:, k] for k in range(5))
        det = Gxx * Gyy - Gxy * Gxy
        idet = 1.0 / jnp.maximum(det, 1e-6)
        d = jnp.stack([(Gyy * bx - Gxy * by) * idet,
                       (Gxx * by - Gxy * bx) * idet], axis=-1)
        ok = (det > 1e-6)[:, None]
        d = jnp.clip(jnp.where(ok, d, 0.0),
                     -cfg.render_clip, cfg.render_clip)
        return v + d, (Gxx, Gxy, Gyy), r

    v = v_pred
    G = None
    r = None
    for _ in range(max(cfg.render_iters, 1)):
        v, G, r = gn_iter(v)
    Gxx, Gxy, Gyy = G

    support = jax.ops.segment_sum(w1.reshape(-1), ids, num_segments=V)
    # intensity-noise scale ESTIMATED from the converged residuals (the
    # standard GN sigma-hat), floored at the configured render_r: with a
    # fixed sigma^2 the covariance of a well-textured vertex is ~1e-4 px^2
    # and any unmodeled deformation blows NIS past the lifecycle gate —
    # the whole mesh then dies of overconfidence within max_misses frames
    sig2 = jnp.maximum(cfg.render_r,
                       seg(r * r, w1) / jnp.maximum(support, 1e-6))
    det = jnp.maximum(Gxx * Gyy - Gxy * Gxy, 1e-6)
    idet = 1.0 / det
    Rk = (sig2 * idet)[:, None, None] * jnp.stack(
        [jnp.stack([Gyy, -Gxy], axis=-1),
         jnp.stack([-Gxy, Gxx], axis=-1)], axis=-2)

    # texture gate: min eigenvalue of G per unit support (the per-vertex
    # effective pixel count sum bary — same normalization role as
    # photometric's win*win; sums to P over the mesh)
    tr = Gxx + Gyy
    disc = jnp.sqrt(jnp.maximum((Gxx - Gyy) ** 2 + 4.0 * Gxy * Gxy, 0.0))
    emin = 0.5 * (tr - disc) / jnp.maximum(support, 1e-6)
    drift = jnp.linalg.norm(v - v_pred, axis=-1)
    valid = (emin > cfg.render_min_eig) & (
        drift < cfg.render_clip * max(cfg.render_iters, 1)) & (support > 0.5)
    return v, Rk, valid


def render_step(state, gray: jnp.ndarray, cfg: EkfConfig,
                F: jnp.ndarray, Q: jnp.ndarray, tmpl: RenderTemplate):
    """Predict + render update (measurement="render"): the deformed-mesh
    appearance model as THE measurement — no dense flow involved. Same
    (state', aux) contract as models.ekf.ekf_step. Track slots are mesh
    vertices; the pool size must equal tmpl.rest.shape[0]."""
    from . import dynamics
    from .ekf import commit_update, predict, update
    x_pred, P_pred = predict(state.x, state.P, F, Q, q_scale=state.q_scale)
    z, Rk, valid = render_measure(gray, tmpl, x_pred[:, 0:2], cfg)
    Hm = jnp.asarray(dynamics.position_H(cfg))
    y = z - x_pred[:, 0:2]
    x_new, P_new, nis = update(x_pred, P_pred, y, Hm, Rk)
    return commit_update(state, x_pred, P_pred, x_new, P_new, nis, cfg,
                         valid=valid)


def render_refine(state, aux, gray: jnp.ndarray, cfg: EkfConfig,
                  tmpl: RenderTemplate):
    """Second sequential EKF update (measurement="flow_render"): render
    refinement of the flow-updated state, linearized there. aux["nis"]
    stays the flow channel's (the NIS gate's input)."""
    from . import dynamics
    from .ekf import update
    z, Rk, valid = render_measure(gray, tmpl, state.x[:, 0:2], cfg)
    Hm = jnp.asarray(dynamics.position_H(cfg))
    y = z - state.x[:, 0:2]
    x_new, P_new, _nis = update(state.x, state.P, y, Hm, Rk)
    live = state.alive & valid
    m = live[:, None]
    x_out = jnp.where(m, x_new, state.x)
    P_out = jnp.where(m[..., None], P_new, state.P)
    return state._replace(x=x_out, P=P_out), aux


# ----------------------------------------------------------- NumPy twin

def render_measure_np(gray, tmpl, v_pred, cfg: EkfConfig):
    """Float64 NumPy twin of render_measure — the parity oracle."""
    gray = np.asarray(gray, np.float64)
    h, w = gray.shape
    tri = np.asarray(tmpl.tri)
    bary = np.asarray(tmpl.bary, np.float64)
    tvals = np.asarray(tmpl.tvals, np.float64)
    V = np.asarray(tmpl.rest).shape[0]

    def samp(img, x, y):
        x = np.clip(x, 0.0, w - 1.0)
        y = np.clip(y, 0.0, h - 1.0)
        x0 = np.clip(np.floor(x), 0, w - 2).astype(np.int64)
        y0 = np.clip(np.floor(y), 0, h - 2).astype(np.int64)
        fx = x - x0
        fy = y - y0
        return (img[y0, x0] * (1 - fx) * (1 - fy)
                + img[y0, x0 + 1] * fx * (1 - fy)
                + img[y0 + 1, x0] * (1 - fx) * fy
                + img[y0 + 1, x0 + 1] * fx * fy)

    gx = np.zeros_like(gray)
    gy = np.zeros_like(gray)
    gx[:, 1:-1] = (gray[:, 2:] - gray[:, :-2]) * 0.5
    gy[1:-1, :] = (gray[2:, :] - gray[:-2, :]) * 0.5

    w1 = bary
    ids = tri.reshape(-1)

    def seg(per_pixel, wgt):
        out = np.zeros(V, np.float64)
        np.add.at(out, ids, (wgt * per_pixel[:, None]).reshape(-1))
        return out

    v = np.asarray(v_pred, np.float64).copy()
    G = None
    r = None
    for _ in range(max(cfg.render_iters, 1)):
        vt = v[tri]                                    # (P, 3, 2)
        q = np.einsum("pm,pmc->pc", w1, vt)
        I = samp(gray, q[:, 0], q[:, 1])
        gxp = samp(gx, q[:, 0], q[:, 1])
        gyp = samp(gy, q[:, 0], q[:, 1])
        r = tvals - I
        Gxx = seg(gxp * gxp, w1)   # row-lumped normal matrix (see JAX twin)
        Gxy = seg(gxp * gyp, w1)
        Gyy = seg(gyp * gyp, w1)
        bx = seg(gxp * r, w1)
        by = seg(gyp * r, w1)
        det = Gxx * Gyy - Gxy * Gxy
        idet = 1.0 / np.maximum(det, 1e-6)
        d = np.stack([(Gyy * bx - Gxy * by) * idet,
                      (Gxx * by - Gxy * bx) * idet], axis=-1)
        d[det <= 1e-6] = 0.0
        d = np.clip(d, -cfg.render_clip, cfg.render_clip)
        v = v + d
        G = (Gxx, Gxy, Gyy)
    Gxx, Gxy, Gyy = G
    support = np.zeros(V, np.float64)
    np.add.at(support, ids, w1.reshape(-1))
    sig2 = np.maximum(cfg.render_r,
                      seg(r * r, w1) / np.maximum(support, 1e-6))
    det = np.maximum(Gxx * Gyy - Gxy * Gxy, 1e-6)
    Rk = (sig2 / det)[:, None, None] * np.stack(
        [np.stack([Gyy, -Gxy], axis=-1),
         np.stack([-Gxy, Gxx], axis=-1)], axis=-2)
    tr = Gxx + Gyy
    disc = np.sqrt(np.maximum((Gxx - Gyy) ** 2 + 4.0 * Gxy ** 2, 0.0))
    emin = 0.5 * (tr - disc) / np.maximum(support, 1e-6)
    drift = np.linalg.norm(v - np.asarray(v_pred, np.float64), axis=-1)
    valid = (emin > cfg.render_min_eig) & (
        drift < cfg.render_clip * max(cfg.render_iters, 1)) & (support > 0.5)
    return v, Rk, valid
