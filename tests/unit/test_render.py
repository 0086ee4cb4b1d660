"""Mesh-render measurement channel (models/render.py).

The deformed-mesh appearance observation (SURVEY.md §2.1 #3: the
reference's OpenGL render + CUDA J^T z component). Template rasterization
invariants; parity vs the float64 NumPy twin; the VJP J^T r product vs
finite differences (the autodiff replacement for perturb-render-diff);
recovery of an analytic affine deformation; and EKF integration where the
mesh render survives rotation+stretch that breaks rigid patch templates.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kalman_hydra_tpu import pipeline as pl
from kalman_hydra_tpu.config import EkfConfig, RunConfig, TrackConfig
from kalman_hydra_tpu.io.synthetic import deforming_body_clip, translating_pair
from kalman_hydra_tpu.models.mesh import build_mesh
from kalman_hydra_tpu.models.render import (make_template, render_jtz,
                                            render_loss, render_measure,
                                            render_measure_np, warp_to_rest)


def _grid_mesh(cx, cy, half, n=5):
    """n x n vertex grid centered at (cx, cy), Delaunay-triangulated."""
    xs = np.linspace(cx - half, cx + half, n)
    ys = np.linspace(cy - half, cy + half, n)
    pts = np.stack(np.meshgrid(xs, ys), axis=-1).reshape(-1, 2)
    return build_mesh(pts.astype(np.float32))


def _textured_frame(h, w, seed=0):
    rng = np.random.default_rng(seed)
    from kalman_hydra_tpu.io.synthetic import _textured_background
    return (_textured_background(h, w, rng) * 255.0).astype(np.float32)


def test_template_rasterization_invariants():
    img = _textured_frame(64, 80, seed=1)
    mesh = _grid_mesh(40, 32, 20, n=4)
    tmpl = make_template(img, mesh)
    pix = np.asarray(tmpl.pix)
    bary = np.asarray(tmpl.bary)
    # barycentric weights are a partition of unity ...
    np.testing.assert_allclose(bary.sum(-1), 1.0, atol=1e-5)
    # ... and reproduce the pixel center through the REST configuration
    q = np.einsum("pm,pmc->pc", bary,
                  np.asarray(tmpl.rest)[np.asarray(tmpl.tri)])
    np.testing.assert_allclose(q, pix, atol=1e-3)
    # template values are the frame-0 intensities at those pixels
    vals = img[pix[:, 1].astype(int), pix[:, 0].astype(int)]
    np.testing.assert_allclose(np.asarray(tmpl.tvals), vals, atol=1e-5)
    # identity warp reproduces the template exactly
    iw = np.asarray(warp_to_rest(jnp.asarray(img), tmpl.rest, tmpl))
    np.testing.assert_allclose(iw, np.asarray(tmpl.tvals), atol=1e-3)


def test_render_measure_matches_numpy_twin():
    a, b, _ = translating_pair(height=96, width=96, shift=(1.4, -0.8))
    mesh = _grid_mesh(48, 48, 26, n=5)
    tmpl = make_template(np.asarray(a, np.float32), mesh)
    cfg = EkfConfig()
    v_pred = mesh.vertices + np.array([1.0, -0.4], np.float32)
    z_np, R_np, ok_np = render_measure_np(b, tmpl, v_pred, cfg)
    z_j, R_j, ok_j = render_measure(jnp.asarray(b, jnp.float32), tmpl,
                                    jnp.asarray(v_pred), cfg)
    np.testing.assert_allclose(np.asarray(z_j), z_np, atol=2e-2)
    np.testing.assert_allclose(np.asarray(R_j), R_np, rtol=5e-2, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ok_j), ok_np)
    # GN lands on the true rigid shift for well-supported vertices
    np.testing.assert_allclose(z_np[ok_np],
                               (mesh.vertices + [1.4, -0.8])[ok_np],
                               atol=0.2)


def test_render_jtz_matches_finite_differences():
    """The matrix-free J^T r via VJP (the reference's CUDA kernel output)
    equals the finite-difference gradient of the render energy."""
    a, b, _ = translating_pair(height=72, width=72, shift=(0.7, 0.4))
    mesh = _grid_mesh(36, 36, 18, n=3)
    tmpl = make_template(np.asarray(a, np.float32), mesh)
    verts = jnp.asarray(mesh.vertices + np.float32([0.3, -0.2]))
    g = np.asarray(render_jtz(jnp.asarray(b, jnp.float32), verts, tmpl))
    loss = jax.jit(render_loss)
    eps = 1e-3
    for vi in (0, 4, 7):
        for c in (0, 1):
            dv = jnp.zeros_like(verts).at[vi, c].set(eps)
            fd = (float(loss(jnp.asarray(b, jnp.float32), verts + dv, tmpl))
                  - float(loss(jnp.asarray(b, jnp.float32), verts - dv,
                               tmpl))) / (2 * eps)
            # J^T r = -dL/dv
            assert abs(-fd - g[vi, c]) < 5e-2 * max(1.0, abs(fd)), (vi, c)


def test_render_recovers_affine_deformation():
    """Warp a textured frame by a known affine map; block-GN from a
    perturbed prediction recovers the true deformed vertex positions —
    rotation+scale that a rigid patch template cannot represent."""
    h = w = 96
    img = _textured_frame(h, w, seed=3)
    c = np.float32([w / 2, h / 2])
    th, sx, sy = 0.06, 1.05, 0.97
    A = np.float32([[sx * np.cos(th), -np.sin(th)],
                    [np.sin(th), sy * np.cos(th)]])
    # observed frame: I_obs(x) = img(A^-1 (x - c) + c)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    Ai = np.linalg.inv(A).astype(np.float32)
    qx = Ai[0, 0] * (xx - c[0]) + Ai[0, 1] * (yy - c[1]) + c[0]
    qy = Ai[1, 0] * (xx - c[0]) + Ai[1, 1] * (yy - c[1]) + c[1]
    from kalman_hydra_tpu.io.synthetic import _bilinear
    obs = _bilinear(img, qx, qy).astype(np.float32)

    mesh = _grid_mesh(c[0], c[1], 22, n=5)
    tmpl = make_template(img, mesh)
    v_true = (mesh.vertices - c) @ A.T + c
    cfg = EkfConfig(render_iters=8)
    z, _R, ok = render_measure(jnp.asarray(obs), tmpl,
                               jnp.asarray(mesh.vertices), cfg)
    z = np.asarray(z)
    ok = np.asarray(ok)
    assert ok.sum() >= 0.8 * len(ok)
    err = np.linalg.norm(z - v_true, axis=-1)
    assert float(np.median(err[ok])) < 0.25


def _mesh_truth(mesh, num_frames, stretch, omega, velocity, c0):
    """Analytic vertex trajectories of deforming_body_clip's forward map."""
    sx, sy = stretch
    v = np.asarray(velocity, np.float32)
    out = np.empty((num_frames, len(mesh.vertices), 2), np.float32)
    for t in range(num_frames):
        a = np.float32([1 + sx * np.sin(omega * t),
                        1 + sy * np.sin(omega * t)])
        out[t] = c0 + v * t + (mesh.vertices - c0) * a[None, :]
    return out


def test_render_tracking_through_deforming_body():
    """EKF + render channel tracks mesh vertices through the deforming
    textured body to sub-pixel accuracy (the reference's whole-animal
    scenario), and stays at least as accurate as the independent-patch
    photometric channel under the same conditions."""
    stretch, omega, vel = (0.10, -0.07), 0.5, (0.5, 0.25)
    frames, _truth, _s = deforming_body_clip(
        num_frames=10, height=128, width=160, stretch=stretch, omega=omega,
        velocity=vel, seed=2, color=False)
    c0 = np.float32([160 * 0.5, 128 * 0.5])
    mesh = _grid_mesh(c0[0], c0[1], 28, n=5)
    tmpl = make_template(np.asarray(frames[0], np.float32), mesh)
    v_truth = _mesh_truth(mesh, len(frames), stretch, omega, vel, c0)

    cfg = RunConfig(
        ekf=EkfConfig(measurement="render", state_dim=4, q=0.3),
        tracks=TrackConfig(num_tracks=len(mesh.vertices), reinit=False))
    tr = pl.track_clip(frames, cfg, seeds=mesh.vertices, render_tmpl=tmpl)
    err_render = np.linalg.norm(tr.positions - v_truth, axis=-1)

    pcfg = cfg.replace(ekf=EkfConfig(measurement="photometric",
                                     state_dim=4, q=0.3))
    tr_p = pl.track_clip(frames, pcfg, seeds=mesh.vertices)
    err_photo = np.linalg.norm(tr_p.positions - v_truth, axis=-1)

    assert float(np.median(err_render[-1])) < 0.5
    assert (np.median(err_render[-1]) <= np.median(err_photo[-1]) + 0.05)


def test_flow_render_refinement_runs_and_tracks():
    frames, _truth, _s = deforming_body_clip(
        num_frames=8, height=128, width=160, stretch=(0.08, -0.05),
        omega=0.5, velocity=(0.6, 0.3), seed=5, color=False)
    c0 = np.float32([80.0, 64.0])
    mesh = _grid_mesh(c0[0], c0[1], 26, n=4)
    tmpl = make_template(np.asarray(frames[0], np.float32), mesh)
    v_truth = _mesh_truth(mesh, len(frames), (0.08, -0.05), 0.5,
                          (0.6, 0.3), c0)
    cfg = RunConfig(
        ekf=EkfConfig(measurement="flow_render", state_dim=4, q=0.3),
        tracks=TrackConfig(num_tracks=len(mesh.vertices), reinit=False))
    tr = pl.track_clip(frames, cfg, seeds=mesh.vertices, render_tmpl=tmpl)
    err = np.linalg.norm(tr.positions[-1] - v_truth[-1], axis=-1)
    assert np.all(np.isfinite(tr.positions))
    assert float(np.median(err)) < 0.6


def test_render_config_validation():
    with pytest.raises(ValueError, match="reinit"):
        RunConfig(ekf=EkfConfig(measurement="render"),
                  tracks=TrackConfig(reinit=True))
    with pytest.raises(ValueError, match="RenderTemplate"):
        pl.make_step(RunConfig(ekf=EkfConfig(measurement="render"),
                               tracks=TrackConfig(reinit=False)))
    # vertex-count mismatch is rejected up front
    img = _textured_frame(64, 64, seed=0)
    mesh = _grid_mesh(32, 32, 16, n=3)
    tmpl = make_template(img, mesh)
    cfg = RunConfig(ekf=EkfConfig(measurement="render"),
                    tracks=TrackConfig(num_tracks=4, reinit=False))
    with pytest.raises(ValueError, match="vertices"):
        pl.make_step(cfg, render_tmpl=tmpl)
    # config JSON round-trip with the new fields
    cfg2 = RunConfig(ekf=EkfConfig(measurement="render", render_iters=7),
                     tracks=TrackConfig(reinit=False))
    assert RunConfig.from_json(cfg2.to_json()) == cfg2


def test_api_track_mesh_end_to_end():
    frames, _truth, _s = deforming_body_clip(
        num_frames=8, height=128, width=160, stretch=(0.10, -0.07),
        omega=0.5, velocity=(0.5, 0.25), seed=2, color=False)
    from kalman_hydra_tpu import api
    from kalman_hydra_tpu.models.mesh import mesh_strain_sequence
    mesh, tr = api.track_mesh(frames, n_vertices=24, seed=1)
    assert tr.positions.shape == (len(frames), len(mesh.vertices), 2)
    assert np.all(np.isfinite(tr.positions))
    # no vertex may die of gate overconfidence (the q=0.05 default +
    # fixed-sigma GN covariance used to kill 7/24 on this clip)
    assert tr.alive[-1].all()
    # vertices must move with the drifting body (velocity 0.5 px/frame x)
    drift = np.median(tr.positions[-1, :, 0] - tr.positions[0, :, 0])
    assert drift > 1.5
    # strain recovery THROUGH the deformation sign reversal (frames 7-9
    # have e_xx < 0; a lagging filter reports it still positive)
    s = mesh_strain_sequence(mesh, tr.positions)
    exx = np.median(s["F"][:, :, 0, 0] - 1.0, axis=1)
    assert float(np.max(np.abs(exx - _s[:, 0]))) < 0.02
