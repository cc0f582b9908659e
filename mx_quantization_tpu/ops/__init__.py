"""MX quantization op library (JAX/TPU-native)."""

from .elemwise import (
    floor_log2_int,
    pow2,
    quantize_bfloat,
    quantize_elemwise,
    quantize_elemwise_core,
    quantize_elemwise_op,
    quantize_fp,
)
from .mx import (
    MxPacked,
    block_view,
    mx_decode,
    mx_encode,
    quantize_mx,
    quantize_mx_op,
    shared_exponents,
    unblock_view,
)
from .vector import (
    vec_add,
    vec_div,
    vec_exp,
    vec_exp2,
    vec_mul,
    vec_quantize,
    vec_recip,
    vec_reduce_mean,
    vec_reduce_sum,
    vec_sqrt,
    vec_sub,
    vec_tanh,
)
from .linear import bmm, linear, matmul, mx_dot, mx_linear, mx_matmul
from .softmax import mx_softmax, softmax
from .activations import (
    gelu,
    mx_gelu,
    mx_relu,
    mx_sigmoid,
    mx_silu,
    mx_tanh,
    relu,
    sigmoid,
    silu,
    tanh,
)
from .norms import (
    group_norm,
    layer_norm,
    mx_group_norm,
    mx_layer_norm,
    mx_rms_norm,
    rms_norm,
)
from .conv import conv1d, conv2d, conv3d, mx_conv
