"""Temporal warm-start accuracy A/B at the headline shape.

The fps side is measured by tools/headline_ab.py (KH_TEMPORAL_INIT=1 +
KH_DIAG_ITERS): warm-2 = 197 fps, warm-1 = 289 fps vs the cold-3
headline 160.6. This tool measures the ACCURACY side of that trade on
the same 1080p bench clip:

1. tracking error vs synthetic truth (moving-blob clip, seeds = truth
   points at t=0) for cold iters=3 / temporal iters=2 / temporal iters=1
2. chained-EPE parity: our temporal chain (flow0 = previous pair's flow)
   vs cv2 chained with OPTFLOW_USE_INITIAL_FLOW — apples-to-apples
   oracle for the warm-start mode (cv2 wrapper: ref/imgproc.py:41)

Run solo on the TPU (one process at a time); D2H is scalars + (T,16,2)
positions only. `python tools/temporal_ab.py [--cpu]`.
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kalman_hydra_tpu import pipeline as pl  # noqa: E402
from kalman_hydra_tpu.config import (EkfConfig, FlowConfig, RunConfig,  # noqa: E402
                                     TrackConfig)
from kalman_hydra_tpu.io.synthetic import moving_blob_clip  # noqa: E402
from kalman_hydra_tpu.ops.farneback import farneback  # noqa: E402
from kalman_hydra_tpu.ref import imgproc as ip  # noqa: E402

H, W, T = (256, 256, 9) if "--cpu" in sys.argv else (1080, 1920, 9)
IMPL = os.environ.get("KH_IMPL", "xla" if "--cpu" in sys.argv else "pallas")

frames, truth = moving_blob_clip(
    num_frames=T, height=H, width=W, num_points=16,
    blob_sigma=max(H, W) / 18.0, velocity=(2.1, -1.4), seed=0)
frames_d = jnp.asarray(frames)
# headline shape: K=1024 (small K hits untested kernel tiles on hardware);
# first 16 slots carry the truth points, the rest a throwaway grid
K = 16 if "--cpu" in sys.argv else 1024
g = int(np.ceil(np.sqrt(K)))
gy, gx = np.mgrid[0:g, 0:g]
grid = np.stack([8 + gx.ravel() * (W - 16) / max(g - 1, 1),
                 8 + gy.ravel() * (H - 16) / max(g - 1, 1)],
                axis=-1)[:K].astype(np.float32)
grid[:16] = truth.positions[0]
seeds = jnp.asarray(grid)

print(f"shape {frames.shape} impl={IMPL}", file=sys.stderr)

out = {"impl": IMPL, "hw": f"{H}x{W}"}
# optional stage filter: pass any of cold3/warm2/warm1/epe2/epe1 on the
# command line to run a subset (full 1080p run exceeds a 10-min window
# on this 1-vCPU host; compiles dominate)
SEL = [a for a in sys.argv[1:] if not a.startswith("--")]

# ---- 1. tracking error vs truth ------------------------------------
for name, iters, warm in [("cold3", 3, False), ("warm2", 2, True),
                          ("warm1", 1, True)]:
    if SEL and name not in SEL:
        continue
    # headline bench flow config (bench.py bench_fused_pipeline): fast
    # select-sum warp + bf16 polyexp planes — accuracy must be measured
    # on the same path the fps number runs
    cfg = RunConfig(
        flow=FlowConfig(iterations=iters, temporal_init=warm,
                        fast_warp=8, bf16_poly=IMPL != "xla" or H > 700),
        ekf=EkfConfig(state_dim=6),
        tracks=TrackConfig(num_tracks=K, corner_pool=max(256, K),
                           reinit=False),
        impl=IMPL)
    res = jax.jit(lambda f, s, c=cfg: pl.track_arrays(f, c, seeds=s))(
        frames_d, seeds)
    pos = np.asarray(res["pos"][:, :16])  # (T, 16, 2) — tiny D2H
    err = np.linalg.norm(pos - truth.positions, axis=-1)[1:]
    out[f"track_err_px_{name}"] = round(float(err.mean()), 4)
    out[f"track_err_max_{name}"] = round(float(err.max()), 4)
    print(f"{name}: mean {err.mean():.4f} px max {err.max():.4f} px",
          file=sys.stderr)

# ---- 2. chained-EPE parity vs chained cv2 ---------------------------
gray = frames.mean(axis=-1).astype(np.uint8) if frames.ndim == 4 else frames
for name, iters in [("warm2", 2), ("warm1", 1)]:
    if SEL and f"epe{iters}" not in SEL:
        continue
    # headline flags (cv2 wrapper ignores fast_warp/bf16_poly — host is
    # always exact); pallas + f32 planes at 1080p crashes the worker,
    # tracked separately
    cfg = FlowConfig(iterations=iters, fast_warp=8,
                     bf16_poly=IMPL != "xla" or H > 700)
    # host chain: cv2 with OPTFLOW_USE_INITIAL_FLOW
    ref_flow = None
    for t in range(T - 1):
        ref_flow = ip.farneback(gray[t], gray[t + 1], cfg, flow0=ref_flow)
    # device chain: same seeding (pair 0 cold, like the cv2 chain), EPE
    # of the FINAL pair fetched as a scalar
    fb = jax.jit(lambda a, b, f0, c=cfg: farneback(a, b, c, flow0=f0,
                                                   impl=IMPL))
    flow_d0 = None
    for t in range(T - 1):
        if flow_d0 is None:
            flow_d0 = jax.jit(lambda a, b, c=cfg: farneback(
                a, b, c, impl=IMPL))(
                jnp.asarray(gray[0], jnp.float32),
                jnp.asarray(gray[1], jnp.float32))
        else:
            flow_d0 = fb(jnp.asarray(gray[t], jnp.float32),
                         jnp.asarray(gray[t + 1], jnp.float32), flow_d0)
    epe = float(np.asarray(jax.jit(
        lambda f, r: jnp.linalg.norm(f - r, axis=-1).mean())(
        flow_d0, jnp.asarray(ref_flow))))
    out[f"chained_epe_px_{name}"] = round(epe, 5)
    print(f"chained EPE {name} (final pair, vs chained cv2): {epe:.5f} px",
          file=sys.stderr)

print(json.dumps(out), flush=True)
