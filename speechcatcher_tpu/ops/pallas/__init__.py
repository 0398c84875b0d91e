"""Pallas TPU kernels for the decode hot path."""
