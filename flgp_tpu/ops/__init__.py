"""Compute kernels of the spectral pipeline."""
