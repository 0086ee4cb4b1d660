"""Headline (1080p fused flow+EKF) bench-level A/B runner.

Usage: python tools/headline_ab.py KEY=VAL [KEY=VAL ...]

Sets the given env knobs BEFORE importing bench (knobs are read at jit
trace time — a fresh process per variant is the only honest A/B, see
ADVICE round-2 #3), then runs bench_fused_pipeline at the headline shape
and prints one JSON line. Run solo (one TPU process at a time)."""

import json
import os
import sys

for kv in sys.argv[1:]:
    k, _, v = kv.partition("=")
    os.environ[k] = v

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402  (sets default knobs + compilation cache)

fps, extra = bench.bench_fused_pipeline(1080, 1920, t=9, num_tracks=1024)
print(json.dumps({"variant": sys.argv[1:], "fps": round(fps, 2), **extra}),
      flush=True)
