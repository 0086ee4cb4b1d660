"""The end-to-end "hydra story" (SURVEY.md §0 orientation, §2.1 #7):

deforming textured body on IMAGE data -> Otsu segmentation -> Lloyd +
Delaunay mesh -> mesh vertices tracked by the flow+EKF pipeline ->
per-triangle strain -> strain-triggered remeshing — asserting the
recovered strain matches the clip's analytic affine deformation.

This chains every stage the reference's workflow chained (find the
animal, mesh it, track the mesh, quantify deformation); the individual
stages have their own unit tests, this is the integration seam.
"""

import numpy as np
import jax.numpy as jnp

from kalman_hydra_tpu import pipeline as pl
from kalman_hydra_tpu.config import (EkfConfig, FlowConfig, RunConfig,
                                     SmoothConfig, TrackConfig)
from kalman_hydra_tpu.io.synthetic import deforming_body_clip
from kalman_hydra_tpu.models import mesh as M
from kalman_hydra_tpu.ops import segment as seg
from kalman_hydra_tpu.ops.color import grayscale_u8


def _run_story(smooth=True):
    frames, truth, strain_true = deforming_body_clip(
        num_frames=12, stretch=(0.15, -0.10), omega=0.5)

    # 1. segmentation (frame 0) -> eroded interior for stable seeding
    g0 = grayscale_u8(jnp.asarray(frames[0]))
    mask = np.asarray(seg.segment_body(g0))
    interior = np.asarray(seg._pool(jnp.asarray(mask), 13, "min"))

    # 2. mesh over the body interior
    mesh = M.mesh_from_mask(interior, n_points=24, seed=0)

    # 3. track the mesh vertices through the clip
    cfg = RunConfig(flow=FlowConfig(levels=3),
                    ekf=EkfConfig(state_dim=4, measurement="implicit_flow",
                                  q=8.0),
                    tracks=TrackConfig(num_tracks=len(mesh.vertices),
                                       reinit=False, init_velocity=True),
                    smooth=SmoothConfig(enabled=smooth))
    tr = pl.track_clip(frames, cfg, seeds=mesh.vertices)
    pos = tr.smoothed if smooth else tr.positions
    return frames, truth, strain_true, mesh, tr, pos


def test_hydra_story_strain_recovery():
    frames, truth, strain_true, mesh, tr, pos = _run_story()

    # segmentation found a body-sized region and the mesh is non-trivial
    assert 8 <= len(mesh.vertices) <= 24
    assert len(mesh.triangles) >= 10
    # every vertex survived the clip (the body never leaves the frame)
    assert tr.alive[-1].all()

    # 4. per-triangle strain vs the clip's analytic affine deformation:
    # the body deforms as diag(1+exx, 1+eyy), so the mesh-mean diagonal
    # deformation gradient IS the engineering strain
    strain = M.mesh_strain_sequence(mesh, pos)
    F = strain["F"]
    exx = F[:, :, 0, 0].mean(axis=1) - 1.0
    eyy = F[:, :, 1, 1].mean(axis=1) - 1.0
    # measured max err 0.034 / 0.020 on a +-0.15 / -0.10 deformation
    # (residual = filter lag on the oscillation + Farneback's ~5% motion
    # underestimate, shared with cv2)
    assert float(np.abs(exx - strain_true[:, 0]).max()) < 0.06
    assert float(np.abs(eyy - strain_true[:, 1]).max()) < 0.05
    # the recovered strain follows the analytic oscillation in phase
    assert np.corrcoef(exx, strain_true[:, 0])[0, 1] > 0.97
    assert np.corrcoef(eyy, strain_true[:, 1])[0, 1] > 0.97
    # off-diagonal (shear) stays near zero for the axis-aligned stretch
    assert float(np.abs(F[:, :, 0, 1]).mean()) < 0.03


def test_hydra_story_strain_triggered_remesh():
    """The same tracked deformation drives strain-triggered remeshing:
    events fire when the per-triangle shear crosses the threshold and the
    post-remesh shear resets below it."""
    _f, _t, _s, mesh, _tr, pos = _run_story(smooth=False)
    dyn = M.mesh_strain_sequence_dynamic(mesh, pos, shear_threshold=1.08,
                                         min_quality=0.15)
    assert len(dyn["events"]) >= 1
    # remeshing bounds the accumulated shear near the trigger
    assert float(dyn["max_shear_p95"].max()) < 1.25
    # the sliver filter keeps a nonzero quality floor (quality decays
    # between events as the body deforms, then resets at each remesh)
    assert float(dyn["quality_min"].min()) > 0.02
