"""Hand-written Pallas TPU kernels for the hot ops."""
