"""Pallas TPU kernels: fused MX quantization + matmul (the framework's L0).

The reference implements its L0 as CUDA kernels
(microxscaling/mx/cpp/mx.cuh, elemwise.cuh, reduce.cuh); here the same role
is filled by Pallas kernels that fuse block quantization into the MXU matmul
prologue — no fake-quantized copies ever round-trip HBM.
"""

from .quantize import mx_quantize_pallas
