"""Compute kernels over padded point arrays (VPU/MXU friendly, fully masked)."""
