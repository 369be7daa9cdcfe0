"""Pallas TPU kernels for the hot ops (flow-projection scatter, filter
interpolation gather).  Pure-JAX formulations in the parent package remain
the semantic oracles; these kernels are bit-compatible fast paths."""
