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
    leaky_relu,
    mx_gelu,
    mx_leaky_relu,
    mx_relu,
    mx_relu6,
    mx_sigmoid,
    mx_silu,
    mx_tanh,
    relu,
    relu6,
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
from .transpose_conv import conv_transpose2d, mx_conv_transpose2d
from .pooling import adaptive_avg_pool2d, mx_adaptive_avg_pool2d
from .batchnorm import BatchNormState, batch_norm, init_batchnorm_state
from .rnn import (LSTMParams, LSTMStackParams, init_lstm,
                  init_lstm_stack, lstm, lstm_stack)
from .simd import (simd_add, simd_div, simd_exp, simd_log, simd_mul,
                   simd_norm, simd_reduce_mean, simd_reduce_sum, simd_split,
                   simd_sqrt, simd_square, simd_sub)
from .quantize_ste import quantize_bfloat_grad, quantize_mx_ste
from .fastquant import fused_eligible, quantize_mx_fast
