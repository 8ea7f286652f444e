"""Pallas TPU kernels for the hot operator path."""
