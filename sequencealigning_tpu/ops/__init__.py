"""Compute ops: scalar oracles (ground truth), Pallas/JAX kernels, traceback.

The oracles are slow, obviously-correct NumPy/Python implementations that
replicate the reference's algorithms *including their quirks* (documented
per-function).  Every TPU kernel is validated against them.
"""
