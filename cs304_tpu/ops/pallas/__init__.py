"""Pallas TPU kernels for the hot ops (trellis recursion)."""
