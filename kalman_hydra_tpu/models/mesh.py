"""Deformable-mesh layer over the tracked body (SURVEY.md §2.1 #7).

The reference carried a DistMesh-style triangulated mesh over the segmented
animal and re-estimated vertex motion every frame. Rebuild: mesh GENERATION
is host-side (scipy Delaunay over mask-interior points with a few
Lloyd-style relaxation sweeps — the Persson-Strang flavor without the
force loop); mesh TRACKING rides the existing EKF track pipeline (vertices
== tracked points); per-triangle deformation/strain is computed on device,
vmapped over triangles.

Mesh topology is fixed BETWEEN remesh events (static shapes under jit);
dynamic remeshing (the reference re-meshed as the body deformed —
SURVEY.md §2.1 #7 DistMesh force relaxation) is strain-triggered on host:
when the tracked configuration's shear exceeds a threshold, the topology
is rebuilt on the current vertex positions (`remesh_topology`), or the
body is fully resampled with Lloyd+Delaunay and track ids remapped to the
nearest old vertex (`remesh_resample`).
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
               max_edge: Optional[float] = None,
               min_quality: float = 0.0) -> BodyMesh:
    """Delaunay triangulation; optionally drop long-edge triangles
    (max_edge) and slivers (min_quality, see triangle_quality)."""
    from scipy.spatial import Delaunay
    tri = Delaunay(points)
    t = tri.simplices.astype(np.int32)
    if max_edge is not None:
        p = points[t]                      # (T, 3, 2)
        e = np.linalg.norm(p - np.roll(p, 1, axis=1), axis=-1)
        t = t[(e <= max_edge).all(axis=1)]
    if min_quality > 0.0:
        t = t[triangle_quality(points, t) >= min_quality]
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


def triangle_quality(points: np.ndarray, triangles: np.ndarray) -> np.ndarray:
    """Per-triangle shape quality 4*sqrt(3)*area / sum(edge^2):
    1 for equilateral, -> 0 for slivers (standard FEM quality measure)."""
    p = np.asarray(points, np.float64)[np.asarray(triangles)]
    e0 = p[:, 1] - p[:, 0]
    e1 = p[:, 2] - p[:, 1]
    e2 = p[:, 0] - p[:, 2]
    area = 0.5 * np.abs(e0[:, 0] * (-e2[:, 1]) - e0[:, 1] * (-e2[:, 0]))
    ssq = (e0 ** 2).sum(-1) + (e1 ** 2).sum(-1) + (e2 ** 2).sum(-1)
    return (4.0 * np.sqrt(3.0) * area / np.maximum(ssq, 1e-12)).astype(
        np.float32)


def remesh_topology(positions: np.ndarray,
                    max_edge: Optional[float] = None,
                    min_quality: float = 0.0) -> BodyMesh:
    """Rebuild topology on the CURRENT (deformed) vertex positions.

    The vertex set — and therefore the track ids — is unchanged; only the
    triangulation is re-run, so triangle quality resets to Delaunay-optimal
    for the deformed configuration and the rest state becomes `positions`.
    """
    return build_mesh(np.asarray(positions, np.float32), max_edge=max_edge,
                      min_quality=min_quality)


def remesh_resample(positions: np.ndarray, n_points: Optional[int] = None,
                    radius: float = 8.0, seed: int = 0):
    """Full Lloyd+Delaunay resample of the deformed body.

    Rasterizes the union of disks around the current vertices (the body's
    footprint as seen by the tracker), samples ~uniform interior points
    with Lloyd relaxation, triangulates, and maps every new vertex to its
    nearest OLD vertex (the track-id remap the pipeline uses to hand
    filter state to the new seeds). Returns (BodyMesh, vertex_map (V',)).
    """
    pos = np.asarray(positions, np.float64)
    n_points = n_points or len(pos)
    lo = np.floor(pos.min(axis=0) - radius).astype(int)
    hi = np.ceil(pos.max(axis=0) + radius).astype(int) + 1
    w, h = hi[0] - lo[0], hi[1] - lo[1]
    yy, xx = np.mgrid[0:h, 0:w]
    mask = np.zeros((h, w), bool)
    for p in pos:
        mask |= ((xx - (p[0] - lo[0])) ** 2
                 + (yy - (p[1] - lo[1])) ** 2) <= radius * radius
    pts = sample_mask_points(mask.astype(np.float32), n_points, seed=seed)
    pts = pts + lo[None, :].astype(np.float32)
    mesh = build_mesh(pts, max_edge=3.5 * radius)
    d2 = ((pts[:, None, :] - pos[None, :, :].astype(np.float32)) ** 2).sum(-1)
    vertex_map = d2.argmin(axis=1).astype(np.int32)
    return mesh, vertex_map


def mesh_strain_sequence_dynamic(mesh: BodyMesh, positions: np.ndarray,
                                 shear_threshold: float = 1.5,
                                 max_edge: Optional[float] = None,
                                 min_quality: float = 0.0):
    """Strain over a tracked sequence WITH strain-triggered remeshing.

    Walks the (T, V, 2) vertex trajectories; whenever the 95th-percentile
    per-triangle shear (relative to the current rest configuration)
    exceeds `shear_threshold`, the topology is rebuilt on the current
    positions and the rest state resets there — bounding both accumulated
    strain and triangle-quality decay as the body deforms.

    Returns dict with per-frame `max_shear_p95`, `quality_min`,
    `quality_mean` (T,) and `events` (frame indices that remeshed).
    Cumulative deformation across remesh events is the product of the
    per-segment deformation gradients (standard multiplicative split).
    """
    rest = np.asarray(mesh.vertices, np.float32)
    tris = mesh.triangles
    events = []
    shear_p95 = np.empty(len(positions), np.float32)
    q_min = np.empty(len(positions), np.float32)
    q_mean = np.empty(len(positions), np.float32)
    for t, cur in enumerate(np.asarray(positions, np.float32)):
        d = jax.device_get(triangle_deformation(
            jnp.asarray(rest), jnp.asarray(cur), jnp.asarray(tris)))
        s95 = float(np.percentile(d["max_shear"], 95))
        if s95 > shear_threshold:
            new_mesh = remesh_topology(cur, max_edge=max_edge,
                                       min_quality=min_quality)
            rest, tris = new_mesh.vertices, new_mesh.triangles
            events.append(t)
            d = jax.device_get(triangle_deformation(
                jnp.asarray(rest), jnp.asarray(cur), jnp.asarray(tris)))
            s95 = float(np.percentile(d["max_shear"], 95))
        q = triangle_quality(cur, tris)
        shear_p95[t] = s95
        q_min[t] = float(q.min()) if len(q) else 0.0
        q_mean[t] = float(q.mean()) if len(q) else 0.0
    return {"max_shear_p95": shear_p95, "quality_min": q_min,
            "quality_mean": q_mean, "events": events}


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
