"""TPU compute primitives: Pallas kernels and torch-semantics-compatible XLA ops."""
