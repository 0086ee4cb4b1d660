"""Deformable-mesh layer over the tracked body (SURVEY.md §2.1 #7).

The reference carried a DistMesh-style triangulated mesh over the segmented
animal and re-estimated vertex motion every frame. Rebuild: mesh GENERATION
is host-side (scipy Delaunay over mask-interior points with a few
Lloyd-style relaxation sweeps — the Persson-Strang flavor without the
force loop); mesh TRACKING rides the existing EKF track pipeline (vertices
== tracked points); per-triangle deformation/strain is computed on device,
vmapped over triangles.

Mesh topology is fixed after construction (static shapes under jit).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class BodyMesh:
    vertices: np.ndarray    # (V, 2) float32 rest positions (x, y)
    triangles: np.ndarray   # (T, 3) int32 vertex indices


def sample_mask_points(mask: np.ndarray, n_points: int,
                       seed: int = 0, relax_iters: int = 3) -> np.ndarray:
    """~Uniform interior points of a {0,1} mask with Lloyd relaxation."""
    rng = np.random.default_rng(seed)
    ys, xs = np.nonzero(mask > 0.5)
    if len(xs) < n_points:
        raise ValueError("mask too small for requested point count")
    sel = rng.choice(len(xs), size=n_points, replace=False)
    pts = np.stack([xs[sel], ys[sel]], axis=-1).astype(np.float64)
    interior = np.stack([xs, ys], axis=-1).astype(np.float64)
    # Lloyd-ish: assign interior pixels to nearest point, move to centroid
    for _ in range(relax_iters):
        sub = interior[rng.choice(len(interior),
                                  size=min(20000, len(interior)),
                                  replace=False)]
        d2 = ((sub[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        owner = d2.argmin(axis=1)
        for i in range(n_points):
            m = owner == i
            if m.any():
                pts[i] = sub[m].mean(axis=0)
    return pts.astype(np.float32)


def build_mesh(points: np.ndarray,
               max_edge: Optional[float] = None) -> BodyMesh:
    """Delaunay triangulation; optionally drop sliver/long-edge triangles."""
    from scipy.spatial import Delaunay
    tri = Delaunay(points)
    t = tri.simplices.astype(np.int32)
    if max_edge is not None:
        p = points[t]                      # (T, 3, 2)
        e = np.linalg.norm(p - np.roll(p, 1, axis=1), axis=-1)
        t = t[(e <= max_edge).all(axis=1)]
    return BodyMesh(vertices=points.astype(np.float32), triangles=t)


def mesh_from_mask(mask: np.ndarray, n_points: int = 64,
                   seed: int = 0) -> BodyMesh:
    pts = sample_mask_points(mask, n_points, seed=seed)
    h, w = mask.shape
    return build_mesh(pts, max_edge=0.35 * max(h, w))


def triangle_deformation(rest: jnp.ndarray, current: jnp.ndarray,
                         triangles: jnp.ndarray):
    """Per-triangle affine deformation gradient F and strain metrics.

    rest/current: (V, 2) vertex positions; triangles: (T, 3).
    Returns dict with F (T, 2, 2), area_ratio (T,), max_shear (T,).
    """
    def one(tri):
        r = rest[tri]                       # (3, 2)
        c = current[tri]
        Dr = jnp.stack([r[1] - r[0], r[2] - r[0]], axis=-1)   # (2, 2)
        Dc = jnp.stack([c[1] - c[0], c[2] - c[0]], axis=-1)
        det = Dr[0, 0] * Dr[1, 1] - Dr[0, 1] * Dr[1, 0]
        inv = jnp.array([[Dr[1, 1], -Dr[0, 1]], [-Dr[1, 0], Dr[0, 0]]]) \
            / jnp.where(jnp.abs(det) < 1e-8, 1e-8, det)
        F = Dc @ inv
        C = F.T @ F                          # right Cauchy-Green
        tr = C[0, 0] + C[1, 1]
        d = jnp.sqrt(jnp.maximum((C[0, 0] - C[1, 1]) ** 2
                                 + 4 * C[0, 1] ** 2, 0.0))
        lam1 = jnp.sqrt(jnp.maximum((tr + d) * 0.5, 0.0))
        lam2 = jnp.sqrt(jnp.maximum((tr - d) * 0.5, 0.0))
        detF = F[0, 0] * F[1, 1] - F[0, 1] * F[1, 0]
        return F, detF, lam1 / jnp.maximum(lam2, 1e-8)

    F, area_ratio, shear = jax.vmap(one)(triangles)
    return {"F": F, "area_ratio": area_ratio, "max_shear": shear}


def mesh_strain_sequence(mesh: BodyMesh, positions: np.ndarray,
                         alive: Optional[np.ndarray] = None):
    """Strain over a tracked sequence.

    positions: (T, V, 2) tracked vertex trajectories (the pipeline's output
    with seeds = mesh.vertices). Returns stacked per-frame deformation
    dicts (host arrays).
    """
    tris = jnp.asarray(mesh.triangles)
    rest = jnp.asarray(mesh.vertices)

    @jax.jit
    def frame(cur):
        return triangle_deformation(rest, cur, tris)

    outs = [jax.device_get(frame(jnp.asarray(p))) for p in positions]
    return {k: np.stack([o[k] for o in outs]) for k in outs[0]}
