"""mx_quantization_tpu — TPU-native MX quantization + approximated top-k attention.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
d9bjo0522/mx_quantization reference stack: OCP Microscaling (MX) block
floating point quantization (MXINT8/4/2, MXFP8/6/4) for weights and
activations, a family of cheap approximated Q·K^T predictors driving per-row
top-k attention pruning, and quantized DeiT / DiT / PixArt-alpha workloads —
re-designed TPU-first (SPMD mesh sharding, fused Pallas kernels, static
shapes, bf16 MXU matmuls).
"""

__version__ = "0.1.0"

from .formats import ElemFormat, RoundingMode, format_params
from .specs import MxSpecs, add_mx_args, finalize_mx_specs, get_mx_specs
from . import ops
