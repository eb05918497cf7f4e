"""TPU compute kernels: XLA formulations + Pallas fused variants."""
