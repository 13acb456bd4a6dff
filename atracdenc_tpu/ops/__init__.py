"""Shared DSP kernels, expressed as batched XLA/Pallas-friendly tensor ops."""
