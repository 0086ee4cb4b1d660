"""Pallas-TPU fused kernels (the native acceleration layer).

Each kernel is a drop-in twin of an XLA op in `ops/` (same signatures,
float-noise equivalence enforced by tests/unit/test_kernels.py in
interpret mode). Select at runtime with RunConfig.impl = "pallas".

ALL kernels are compiled and parity-verified on real v5e silicon
(tools/pallas_hw_test.py; PARITY.md hardware table) — impl="pallas" is
the production path (160.6 fps/chip at 1080p, BASELINE.md round 3).
On CPU backends they run in interpret mode for tests
(RunConfig.pallas_interpret).
"""
from .ekf_pallas import ekf_fused_step
from .flow_update_pallas import flow_update
from .lk_pallas import lk_sparse as lk_sparse_pallas
from .polyexp_pallas import poly_expansion_planar
from .pyramid_pallas import pyr_down as pyr_down_pallas

__all__ = ["ekf_fused_step", "flow_update", "lk_sparse_pallas",
           "poly_expansion_planar", "pyr_down_pallas"]
