"""Shared Mosaic-safe store idiom for batched kernel output blocks.

The single-item kernels write (C, th, w) output blocks; their batched
twins (pair/frame-batched grids) write (1, C, th, w) blocks carrying a
leading size-1 block axis. The leading axis must be consumed with a
SCALAR index: an `.at[0]` view materializes a Mosaic memref_slice whose
last-two extents must be (8, 128)-aligned, which rejects AT COMPILE TIME
ON HARDWARE for any unaligned extent (coarse pyramid levels, non-128
widths) — interpret mode does not model this (BASELINE.md round-4
hardware-constraint note). Scalar-leading-index stores over the FULL
last-two extents are the silicon-verified pattern, owned here so every
batched kernel shares one copy.
"""

from __future__ import annotations


def batched_store(out_ref):
    """Return `st(c, val)` writing plane c of an output block that is
    either (C, h, w) or batched (1, C, h, w)."""
    if len(out_ref.shape) == 4:
        def st(c, val):
            out_ref[0, c, :, :] = val
    else:
        def st(c, val):
            out_ref[c, :, :] = val
    return st
