"""Pallas TPU kernels for the hot paths."""
