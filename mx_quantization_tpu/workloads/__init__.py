"""Workload drivers: DeiT ImageNet eval, DiT sampling/FID, PixArt-alpha
text-to-image — the L5 layer of the reference stack, re-built on the JAX
models."""
