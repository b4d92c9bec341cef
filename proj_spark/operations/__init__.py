"""Projection / transformation operation kernels (NumPy batch API)."""
