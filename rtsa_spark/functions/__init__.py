"""Vectorized numpy/Arrow kernels exposed as pandas UDFs."""
