"""CPU-pinned CLI wrapper for driving/verifying flows without the TPU relay.

`JAX_PLATFORMS` env is ignored (axon sitecustomize pins the platform), so
the pin must happen via jax.config BEFORE backend init. See
.claude/skills/verify/SKILL.md for the flows worth driving.
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kalman_hydra_tpu.cli import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
