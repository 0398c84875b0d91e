"""TPU compute ops: frontend kernels, attention, and transformer layers."""
