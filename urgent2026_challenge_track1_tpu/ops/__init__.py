"""TPU-first primitive ops: scan recurrences, norms, Pallas kernels."""
