"""Utilities: profiling/tracing, checkpoint/resume."""
from . import checkpoint, profiling

__all__ = ["checkpoint", "profiling"]
