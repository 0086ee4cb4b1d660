"""Deformable-body demo: segment, mesh, track vertices, report strain.

    python examples/mesh_strain_demo.py [--out-dir /tmp/kh_mesh_demo]

The Hydra-behavior workflow the reference was built for (SURVEY.md §0):
find the animal, put a mesh on it, track the mesh through the clip, and
quantify deformation per triangle.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="/tmp/kh_mesh_demo")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    import jax.numpy as jnp
    from kalman_hydra_tpu import pipeline as pl
    from kalman_hydra_tpu.config import FlowConfig, RunConfig, TrackConfig
    from kalman_hydra_tpu.io.synthetic import moving_blob_clip
    from kalman_hydra_tpu.models import mesh as M
    from kalman_hydra_tpu.ops import segment as seg
    from kalman_hydra_tpu.ops.color import grayscale_u8

    print("synthesizing a deforming-body clip...")
    frames, _ = moving_blob_clip(num_frames=12, height=160, width=160,
                                 blob_sigma=22.0, num_points=4, seed=5)

    print("segmenting the body...")
    gray0 = grayscale_u8(jnp.asarray(frames[0]))
    mask = np.asarray(seg.segment_body(gray0))
    interior = np.asarray(seg._pool(jnp.asarray(mask), 21, "min"))
    print(f"  body covers {mask.mean():.0%} of the frame")

    print("building the mesh...")
    mesh = M.mesh_from_mask(interior, n_points=24, seed=0)
    print(f"  {len(mesh.vertices)} vertices, {len(mesh.triangles)} triangles")

    print("tracking mesh vertices (first call compiles)...")
    cfg = RunConfig(flow=FlowConfig(levels=3, fast_warp=8),
                    tracks=TrackConfig(num_tracks=len(mesh.vertices),
                                       reinit=False))
    tr = pl.track_clip(frames, cfg, seeds=mesh.vertices)

    print("computing per-triangle strain...")
    strain = M.mesh_strain_sequence(mesh, tr.positions)
    area = strain["area_ratio"]
    print(f"  area ratio: mean {area.mean():.3f} "
          f"(rigid motion => ~1.0), max dev {np.abs(area - 1).max():.3f}")

    print("dynamic remeshing on a 2x synthetic stretch...")
    # stretch the tracked configuration synthetically to demonstrate
    # strain-triggered re-meshing (the reference re-meshed as the body
    # deformed, SURVEY.md §2.1 #7)
    T = len(tr.positions)
    s = 1.0 + 1.2 * np.arange(T, dtype=np.float32)[:, None, None] / (T - 1)
    stretched = tr.positions * np.concatenate(
        [s, np.ones_like(s)], axis=-1)
    dyn = M.mesh_strain_sequence_dynamic(mesh, stretched,
                                         shear_threshold=1.4,
                                         min_quality=0.15)
    print(f"  remesh events at frames {dyn['events']}; "
          f"shear p95 max {dyn['max_shear_p95'].max():.2f} "
          f"(bounded by the 1.4 trigger), "
          f"quality floor {dyn['quality_min'].min():.2f}")

    np.savez_compressed(
        os.path.join(args.out_dir, "mesh_tracks.npz"),
        vertices=mesh.vertices, triangles=mesh.triangles,
        positions=tr.positions, area_ratio=area,
        max_shear=strain["max_shear"],
        dyn_shear_p95=dyn["max_shear_p95"],
        dyn_quality_min=dyn["quality_min"],
        dyn_events=np.asarray(dyn["events"], np.int32))
    print("done ->", args.out_dir)


if __name__ == "__main__":
    main()
