"""Device-side ops: Pallas kernels + XLA stages of the decode pipeline."""
