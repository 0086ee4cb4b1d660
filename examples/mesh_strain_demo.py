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

    np.savez_compressed(
        os.path.join(args.out_dir, "mesh_tracks.npz"),
        vertices=mesh.vertices, triangles=mesh.triangles,
        positions=tr.positions, area_ratio=area,
        max_shear=strain["max_shear"])
    print("done ->", args.out_dir)


if __name__ == "__main__":
    main()
