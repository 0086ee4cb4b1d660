"""Isolate the 1080p pallas-path TPU worker crash seen with default
FlowConfig flags (tools/temporal_ab.py, round-3 session-6).

The headline path (fast_warp=8 + bf16_poly=True) is fine; the crash
appeared with FlowConfig() defaults (fast_warp=0, bf16_poly=False).
Variants isolate which flag kills the worker:

  python tools/pallas_f32_crash.py f32warp8   # bf16_poly=0, fast_warp=8
  python tools/pallas_f32_crash.py bf16warp0  # bf16_poly=1, fast_warp=0
  python tools/pallas_f32_crash.py f32warp0   # both defaults (known bad)
  python tools/pallas_f32_crash.py small f32warp0  # 256p control

One variant per process, solo on the TPU (a crash wedges the relay —
probe with tools/mosaic_probe.py before the next run).
"""

import sys

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kalman_hydra_tpu.config import FlowConfig  # noqa: E402
from kalman_hydra_tpu.io.synthetic import translating_pair  # noqa: E402
from kalman_hydra_tpu.ops.farneback import farneback  # noqa: E402

VARIANTS = {
    "f32warp8": dict(bf16_poly=False, fast_warp=8),
    "bf16warp0": dict(bf16_poly=True, fast_warp=0),
    "f32warp0": dict(bf16_poly=False, fast_warp=0),
    "bf16warp8": dict(bf16_poly=True, fast_warp=8),
}
name = next(a for a in sys.argv[1:] if a in VARIANTS)
h, w = (256, 256) if "small" in sys.argv else (1080, 1920)

a, b, _ = translating_pair(height=h, width=w, shift=(3.0, -2.0))
cfg = FlowConfig(**VARIANTS[name])
print(f"{name} @{h}x{w}: {VARIANTS[name]}", file=sys.stderr, flush=True)
fl = jax.jit(lambda x, y: farneback(x, y, cfg, impl="pallas"))(
    jnp.asarray(np.round(a), jnp.float32), jnp.asarray(np.round(b),
                                                       jnp.float32))
chk = float(np.asarray(jnp.abs(fl).mean()))
print(f"OK {name} @{h}x{w}: mean|flow| = {chk:.4f}", flush=True)
