"""JAX EKF/RTS/lifecycle vs the NumPy oracle (SURVEY.md §4.1: EKF step vs a
20-line NumPy EKF; linear case vs cv2.KalmanFilter)."""

import numpy as np
import cv2
import jax.numpy as jnp
import pytest

from kalman_hydra_tpu.config import EkfConfig, TrackConfig
from kalman_hydra_tpu.models import dynamics as dyn
from kalman_hydra_tpu.models import ekf as jekf
from kalman_hydra_tpu.models import lifecycle
from kalman_hydra_tpu.models import rts as jrts
from kalman_hydra_tpu.models.ekf import TrackState
from kalman_hydra_tpu.ref import ekf as ref_ekf


@pytest.mark.parametrize("state_dim", [4, 6])
def test_predict_update_matches_numpy_oracle(state_dim, rng):
    cfg = EkfConfig(state_dim=state_dim)
    K, T = 5, 12
    F = dyn.transition(cfg)
    Q = dyn.process_noise(cfg)
    H = dyn.position_H(cfg)
    R = (cfg.r * np.eye(2)).astype(np.float32)

    x = rng.normal(size=(K, state_dim)).astype(np.float32)
    P = np.broadcast_to(np.eye(state_dim, dtype=np.float32) * 2.0,
                        (K, state_dim, state_dim)).copy()
    xj, Pj = jnp.asarray(x), jnp.asarray(P)
    xn, Pn = x.astype(np.float64), P.astype(np.float64)

    for t in range(T):
        z = rng.normal(size=(K, 2)).astype(np.float32) * 5.0
        xj, Pj = jekf.predict(xj, Pj, jnp.asarray(F), jnp.asarray(Q))
        y = jnp.asarray(z) - xj[:, 0:2]
        xj, Pj, nis_j = jekf.update(xj, Pj, y, jnp.asarray(H), jnp.asarray(R))
        for k in range(K):
            xp, Pp = ref_ekf.predict(xn[k], Pn[k], F.astype(np.float64),
                                     Q.astype(np.float64))
            xn[k], Pn[k], nis_n = ref_ekf.update(
                xp, Pp, z[k].astype(np.float64), H.astype(np.float64),
                R.astype(np.float64))
            if k == 0:
                assert abs(float(nis_j[0]) - nis_n) < 1e-3 * (1 + nis_n)
    assert np.abs(np.asarray(xj) - xn).max() < 1e-3
    assert np.abs(np.asarray(Pj) - Pn).max() < 1e-3


def test_linear_kf_matches_cv2_kalmanfilter(rng):
    """cv2.KalmanFilter cross-check for the linear 4-state CV case."""
    cfg = EkfConfig(state_dim=4, q=0.05, r=0.25)
    F = dyn.transition(cfg)
    Q = dyn.process_noise(cfg)
    H = dyn.position_H(cfg)
    R = (cfg.r * np.eye(2)).astype(np.float32)

    kf = cv2.KalmanFilter(4, 2, 0, cv2.CV_64F)
    kf.transitionMatrix = F.astype(np.float64)
    kf.measurementMatrix = H.astype(np.float64)
    kf.processNoiseCov = Q.astype(np.float64)
    kf.measurementNoiseCov = R.astype(np.float64)
    kf.statePost = np.zeros((4, 1))
    kf.errorCovPost = np.eye(4)

    xj = jnp.zeros((1, 4))
    Pj = jnp.eye(4)[None]
    for t in range(10):
        z = rng.normal(size=2) * 3.0
        kf.predict()
        kf.correct(z.reshape(2, 1))
        xj, Pj = jekf.predict(xj, Pj, jnp.asarray(F), jnp.asarray(Q))
        y = jnp.asarray(z.astype(np.float32))[None] - xj[:, 0:2]
        xj, Pj, _ = jekf.update(xj, Pj, y, jnp.asarray(H), jnp.asarray(R))
    assert np.abs(np.asarray(xj[0]) - kf.statePost.ravel()).max() < 1e-3
    assert np.abs(np.asarray(Pj[0]) - kf.errorCovPost).max() < 1e-3


def test_rts_matches_numpy_oracle(rng):
    cfg = EkfConfig(state_dim=4, q=0.1, r=0.5)
    T, K = 20, 3
    F = dyn.transition(cfg)
    Q = dyn.process_noise(cfg)
    v = np.array([1.0, -0.5])
    truth = np.broadcast_to(
        np.cumsum(np.broadcast_to(v, (T, 2)), axis=0)[:, None, :],
        (T, K, 2)).copy() + 20.0
    z = truth + rng.normal(0, 0.5, size=(T, K, 2))
    x0, P0 = ref_ekf.init_state(cfg, truth[0])
    out = ref_ekf.filter_tracks(cfg, z, x0, P0)
    xs_ref, Ps_ref = ref_ekf.rts_smooth(cfg, out["x_filt"], out["P_filt"],
                                        out["x_pred"], out["P_pred"])
    xs_j, Ps_j = jrts.rts_smooth(
        jnp.asarray(F),
        jnp.asarray(out["x_filt"].astype(np.float32)),
        jnp.asarray(out["P_filt"].astype(np.float32)),
        jnp.asarray(out["x_pred"].astype(np.float32)),
        jnp.asarray(out["P_pred"].astype(np.float32)))
    assert np.abs(np.asarray(xs_j) - xs_ref).max() < 1e-2
    assert np.abs(np.asarray(Ps_j) - Ps_ref).max() < 1e-2


def _mk_state(K=6, n=4):
    return TrackState(
        x=jnp.asarray(np.arange(K * n, dtype=np.float32).reshape(K, n)),
        P=jnp.broadcast_to(jnp.eye(n), (K, n, n)),
        alive=jnp.ones(K, bool),
        misses=jnp.zeros(K, jnp.int32),
        track_id=jnp.zeros(K, jnp.int32))


def test_gate_freezes_outliers():
    cfg = EkfConfig(gate_chi2=9.21)
    st = _mk_state()
    x_pred = st.x + 100.0
    P_pred = st.P * 2.0
    nis = jnp.asarray([1.0, 50.0, 2.0, 9.0, 10.0, 0.1])
    out = lifecycle.gate(st, x_pred, P_pred, nis, cfg)
    gated = np.asarray(nis) > cfg.gate_chi2
    assert np.array_equal(np.asarray(out.misses) > 0, gated)
    # gated tracks rolled back to prediction
    assert np.allclose(np.asarray(out.x)[gated], np.asarray(x_pred)[gated])
    assert np.allclose(np.asarray(out.x)[~gated], np.asarray(st.x)[~gated])


def test_kill_lost_kills_out_of_frame_and_missed():
    cfg = EkfConfig(max_misses=3)
    st = _mk_state()
    st = st._replace(
        x=st.x.at[0, 0].set(-5.0),        # out of frame
        misses=jnp.asarray([0, 3, 1, 0, 0, 0], jnp.int32))
    out = lifecycle.kill_lost(st, cfg, height=100, width=100)
    alive = np.asarray(out.alive)
    assert not alive[0]       # left frame
    assert not alive[1]       # too many misses
    assert alive[2:].all()


def test_reseed_fills_dead_slots_from_corners():
    ekf_cfg = EkfConfig()
    trk_cfg = TrackConfig(min_distance=5.0)
    st = _mk_state()
    st = st._replace(alive=jnp.asarray([True, False, True, False, True, True]))
    corner_pts = jnp.asarray([[50.0, 50.0], [2.0, 2.0], [80.0, 80.0],
                              [90.0, 10.0]], jnp.float32)
    # corner 1 is within min_distance of live track 0 (pos ~ (0,1))
    corner_score = jnp.asarray([5.0, 4.0, 3.0, 0.0])
    out = lifecycle.reseed(st, corner_pts, corner_score, ekf_cfg, trk_cfg)
    assert np.asarray(out.alive).all()
    new_pos = np.asarray(out.x)[[1, 3], 0:2]
    # best two *eligible* corners are (50,50) and (80,80); (2,2) suppressed
    assert {tuple(p) for p in new_pos} == {(50.0, 50.0), (80.0, 80.0)}
    assert np.asarray(out.track_id)[1] == 1
    assert np.asarray(out.track_id)[3] == 1
    assert np.asarray(out.track_id)[[0, 2, 4, 5]].max() == 0


def test_chunked_rts_equals_monolithic(rng):
    cfg = EkfConfig(state_dim=4, q=0.1, r=0.5)
    T, K = 23, 2
    F = dyn.transition(cfg)
    v = np.array([1.0, -0.5])
    truth = np.broadcast_to(
        np.cumsum(np.broadcast_to(v, (T, 2)), axis=0)[:, None, :],
        (T, K, 2)).copy() + 20.0
    z = truth + rng.normal(0, 0.5, size=(T, K, 2))
    x0, P0 = ref_ekf.init_state(cfg, truth[0])
    out = ref_ekf.filter_tracks(cfg, z, x0, P0)
    args = [out["x_filt"].astype(np.float32), out["P_filt"].astype(np.float32),
            out["x_pred"].astype(np.float32), out["P_pred"].astype(np.float32)]
    xs_full, Ps_full = jrts.rts_smooth(jnp.asarray(F), *map(jnp.asarray, args))
    for chunk in (5, 8, 23, 100):
        xs_c, Ps_c = jrts.rts_smooth_chunked(F, *args, chunk=chunk)
        np.testing.assert_allclose(xs_c, np.asarray(xs_full), atol=1e-4)
        np.testing.assert_allclose(Ps_c, np.asarray(Ps_full), atol=1e-4)


# ------------------------------------------------ round-2 filter-zoo widening

def test_coordinated_turn_transition_traces_circle():
    w = 0.2
    cfg = EkfConfig(state_dim=4, dynamics="ct", turn_rate=w)
    F = dyn.transition(cfg)
    x = np.array([0.0, 0.0, 1.0, 0.0], np.float32)   # unit speed along +x
    pts = []
    for _ in range(int(round(2 * np.pi / w))):
        x = F @ x
        pts.append(x[:2].copy())
    pts = np.stack(pts)
    # constant-rate turn: speed preserved, trajectory closes on a circle of
    # radius 1/w
    speeds = np.linalg.norm(np.diff(np.vstack([[[0, 0]], pts]), axis=0),
                            axis=-1)
    np.testing.assert_allclose(speeds, speeds[0], rtol=1e-5)
    center = np.array([0.0, 1.0 / w])
    r = np.linalg.norm(pts - center, axis=-1)
    np.testing.assert_allclose(r, 1.0 / w, rtol=1e-4)


def test_ukf_matches_ekf_on_constant_flow(rng):
    """On a constant flow field the measurement is linear, so the UKF and
    the implicit-flow EKF must agree."""
    from kalman_hydra_tpu.models.ukf import ukf_update
    cfg = EkfConfig(state_dim=4, measurement="implicit_flow")
    K = 16
    F = jnp.asarray(dyn.transition(cfg))
    Q = jnp.asarray(dyn.process_noise(cfg))
    R = jnp.asarray((cfg.r * np.eye(2)).astype(np.float32))
    flow = jnp.broadcast_to(jnp.asarray([1.5, -0.7], jnp.float32),
                            (40, 50, 2))
    x = rng.uniform(8, 35, size=(K, 4)).astype(np.float32)
    x[:, 2:] = rng.normal(size=(K, 2)) * 0.5
    P = np.broadcast_to(np.eye(4, dtype=np.float32) * 2.0, (K, 4, 4)).copy()

    xp, Pp = jekf.predict(jnp.asarray(x), jnp.asarray(P), F, Q)
    y, H = jekf.measure_implicit_flow(flow, jnp.asarray(x), xp, cfg)
    xe, Pe, ne = jekf.update(xp, Pp, y, H, R)
    xu, Pu, nu = ukf_update(xp, Pp, flow, jnp.asarray(x)[:, 0:2], cfg.r, cfg)
    np.testing.assert_allclose(np.asarray(xu), np.asarray(xe), atol=2e-3)
    np.testing.assert_allclose(np.asarray(Pu), np.asarray(Pe), atol=2e-3)
    np.testing.assert_allclose(np.asarray(nu), np.asarray(ne), atol=1e-2)


def test_ukf_pipeline_tracks_truth():
    from kalman_hydra_tpu import pipeline as pl
    from kalman_hydra_tpu.config import FlowConfig, RunConfig
    from kalman_hydra_tpu.io.synthetic import moving_blob_clip
    frames, truth = moving_blob_clip(num_frames=7, height=96, width=96,
                                     num_points=8, blob_sigma=14.0, seed=4)
    def run(ft):
        cfg = RunConfig(flow=FlowConfig(levels=2),
                        ekf=EkfConfig(measurement="implicit_flow",
                                      filter_type=ft),
                        tracks=TrackConfig(num_tracks=8, reinit=False))
        tr = pl.track_clip(frames, cfg, seeds=truth.positions[0])
        return float(np.median(np.linalg.norm(
            tr.positions[-1] - truth.positions[-1], axis=-1)))

    # the UKF must track comparably to the EKF on the same clip (both
    # carry the same dead-reckoning convergence transient at these cfg
    # defaults; absolute accuracy is covered by the EKF parity suite)
    err_ekf = run("ekf")
    err_ukf = run("ukf")
    assert err_ukf < err_ekf + 0.6
    assert err_ukf < 2.5


def test_adaptive_q_inflates_and_recovers(rng):
    cfg = EkfConfig(state_dim=4, adaptive_q=0.3, measurement="position")
    K = 8
    F = jnp.asarray(dyn.transition(cfg))
    Q = jnp.asarray(dyn.process_noise(cfg))
    R = jnp.asarray((cfg.r * np.eye(2)).astype(np.float32))
    seeds = rng.uniform(10, 30, size=(K, 2)).astype(np.float32)
    state = jekf.init_tracks(cfg, jnp.asarray(seeds))
    assert state.q_scale is not None

    # hot innovations: zig-zag flow the CV model cannot follow -> the NIS
    # stays high and q_scale must inflate above 1
    st = state
    for i in range(8):
        sign = 1.0 if i % 2 == 0 else -1.0
        flow_hot = jnp.broadcast_to(
            jnp.asarray([5.0 * sign, 0.0], jnp.float32), (64, 64, 2))
        st, _ = jekf.ekf_step(st, flow_hot, cfg, F, Q, R)
    hot = float(np.asarray(st.q_scale).mean())
    assert hot > 1.5

    # consistent innovations: q_scale decays back toward the floor
    flow_cold = jnp.zeros((64, 64, 2), jnp.float32)
    st2 = st._replace(x=st.x.at[:, 2:4].set(0.0))
    for _ in range(20):
        st2, _ = jekf.ekf_step(st2, flow_cold, cfg, F, Q, R)
    assert float(np.asarray(st2.q_scale).mean()) < 0.5 * hot


def test_invalid_measurement_counts_as_miss():
    """Regression: a live track whose measurement is INVALID (LK status
    false / texture-poor photometric patch) used to report nis = 0,
    which reset the miss counter every frame — a permanently occluded
    track coasted forever. commit_update must report a gate-failing NIS
    so max_misses consecutive invalid frames kill the slot."""
    from kalman_hydra_tpu.models.ekf import commit_update
    cfg = EkfConfig(gate_chi2=9.21, max_misses=3)
    st = _mk_state()
    K = st.x.shape[0]
    valid = jnp.asarray([True, False, True, False, True, True])
    for _ in range(cfg.max_misses):
        x_pred, P_pred = st.x, st.P
        st2, aux = commit_update(st, x_pred, P_pred, st.x + 1.0,
                                 st.P * 1.1, jnp.ones(K), cfg,
                                 valid=valid)
        st = lifecycle.gate(st2, x_pred, P_pred, aux["nis"], cfg)
        st = lifecycle.kill_lost(st, cfg, height=10_000, width=10_000)
    alive = np.asarray(st.alive)
    assert not alive[1] and not alive[3], alive
    assert alive[[0, 2, 4, 5]].all(), alive
    # valid tracks took the update, invalid kept the prediction
    assert np.isfinite(np.asarray(aux["nis"])).all()
