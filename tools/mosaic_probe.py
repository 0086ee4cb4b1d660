"""One-shot Mosaic/Pallas hardware probe (run once per round, CLAUDE.md).

Tries to compile + run a trivial Pallas kernel on the axon TPU with a hard
wall-clock kill so a hung remote_compile can't wedge this process for long
(the relay itself may still need cool-down if this times out — schedule
TPU work accordingly).

Exit codes: 0 = Mosaic works on hardware, 1 = compile/run failed,
2 = timed out (relay possibly wedged — wait before more TPU work).
"""

import os
import signal
import sys


def _alarm(_sig, _frm):
    print("MOSAIC PROBE: TIMED OUT (remote compile hang)", flush=True)
    os._exit(2)


def main():
    timeout = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(timeout)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # tiny jit first: confirm the relay is alive before touching Mosaic
    x = jnp.arange(8.0)
    print("tiny jit:", float(jax.jit(jnp.sum)(x)), flush=True)

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0 + 1.0

    a = jnp.ones((256, 256), jnp.float32)
    f = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype))
    try:
        out = f(a)
        val = float(out[0, 0])
    except Exception as e:  # noqa: BLE001
        print(f"MOSAIC PROBE: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        sys.exit(1)
    ok = abs(val - 3.0) < 1e-6
    print(f"MOSAIC PROBE: {'OK' if ok else 'WRONG RESULT'} ({val})",
          flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
