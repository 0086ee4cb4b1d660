"""XLA cost analysis of the headline pipeline (SURVEY.md §5 profiling:
"per-kernel cost via jitted.lower(...).compile().cost_analysis()")."""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from kalman_hydra_tpu import pipeline as pl
    from kalman_hydra_tpu.config import (EkfConfig, FlowConfig, RunConfig,
                                         TrackConfig)

    cfg = RunConfig(flow=FlowConfig(fast_warp=8, bf16_poly=True),
                    ekf=EkfConfig(state_dim=6),
                    tracks=TrackConfig(num_tracks=1024, corner_pool=1024))
    frames = jnp.zeros((9, 1080, 1920, 3), jnp.uint8)
    fn = jax.jit(lambda f: pl.track_arrays(f, cfg)["pos"])
    compiled = fn.lower(frames).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    bytes_ = ca.get("bytes accessed", float("nan"))
    t = 8  # steps in the scan
    print(f"headline program (8 frame steps @1080p, K=1024):")
    print(f"  flops: {flops/1e9:.2f} GFLOP  ({flops/t/1e9:.2f} /frame)")
    print(f"  bytes accessed: {bytes_/1e9:.2f} GB  ({bytes_/t/1e9:.3f} /frame)")
    try:
        ma = compiled.memory_analysis()
        print(f"  temp memory: {ma.temp_size_in_bytes/1e6:.1f} MB, "
              f"args {ma.argument_size_in_bytes/1e6:.1f} MB")
    except Exception:
        pass
    # roofline context: v5e ~197 TFLOP/s bf16 / ~394 GFLOP/s-equiv VPU f32,
    # ~819 GB/s HBM
    if bytes_ == bytes_:
        print(f"  HBM-bound lower bound: {bytes_/t/819e9*1e3:.2f} ms/frame "
              f"(measured ~18 ms/frame)")


if __name__ == "__main__":
    main()
