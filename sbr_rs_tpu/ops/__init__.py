"""TPU compute ops: losses, sparse-aware optimizers, sampling, scoring."""
