"""Pallas TPU kernels: fused blocked-scan passes (the hot path)."""
