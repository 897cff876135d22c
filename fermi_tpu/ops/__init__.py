"""TPU compute kernels (Pallas) for the hot alignment/search ops."""
