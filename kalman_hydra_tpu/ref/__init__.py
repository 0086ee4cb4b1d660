"""OpenCV/NumPy oracle (CPU): the parity target and 5x-throughput denominator.

Never imported by device code; tests and bench only.
"""
from . import ekf, imgproc, pipeline

__all__ = ["ekf", "imgproc", "pipeline"]
