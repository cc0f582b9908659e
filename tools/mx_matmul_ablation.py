"""RETIRED ablation: Pallas MX-quantized matmul with fused quantization.

MEASURED DEAD END (round 1, real v5e chip, tools/mm_bench.py): 5-7x slower
than XLA's matmul + the one-pass Pallas quantize kernel at DiT-XL/2
serving shapes — fusing the activation quantize into a Pallas matmul
serializes what XLA pipelines (weight-stationary MXU streaming with the
quantize on the VPU of a *separate* fused pass).  Kept here as the
recorded ablation harness, NOT part of the production package
(ops/kernels exports only kernels the framework actually runs).

C = Q(A) @ Q(B) where Q is per-32-block MX fake-quantization:
  * A (M, K) quantized along K (activation contract, axes=[-1])
  * B (K, N) quantized along K (the 'aa' matmul contract quantizes the second
    operand along axis -2 — the same K axis; reference matmul.py:68-83)

Design: grid (M/TM, N/TN, K/TK); each step quantizes its A and B tiles on
the VPU (bit-twiddled exponents, no transcendentals), then issues a bf16 MXU
dot with fp32 accumulation into a VMEM scratch accumulator.  MXINT8 grid
points are exact in bf16, so the products match the reference's fp32 cuBLAS
matmul products; only the accumulation order differs.

This replaces the reference's quantize-kernel + cuBLAS two-pass structure
(mx_ops.py:212-232 -> linear.py:85-88) with a single fused pass: the
fake-quantized operands never round-trip HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mx_quantization_tpu.formats import format_params
from mx_quantization_tpu.ops.kernels.quantize import _quantize_block_values_axis0


def _mm_kernel(a_ref, b_ref, o_ref, acc_ref, *, block_size, mbits_a, mbits_b,
               scale_bits, n_k):
    """One (i, j, k) grid step.

    Mosaic cannot reshape the minor (lane) dimension into 32-wide blocks, so
    both operands are quantized with the K blocks on the SUBLANE axis
    (kernels/quantize.py _quantize_block_values_axis0): B (tk, tn) is already
    laid out that way; A's tile is transposed in-register to (tk, tm) and the
    dot contracts dimension 0 of both (lhs-transposed MXU matmul).
    """
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    at = a_ref[:].T  # (tk, tm): K blocks now on sublanes
    qa_t = _quantize_block_values_axis0(at, block_size, mbits_a, scale_bits,
                                        jnp.bfloat16)
    qb = _quantize_block_values_axis0(b_ref[:], block_size, mbits_b,
                                      scale_bits, jnp.bfloat16)

    acc_ref[:] += jax.lax.dot_general(
        qa_t, qb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("elem_format_a", "elem_format_b",
                                             "block_size", "scale_bits",
                                             "tile_m", "tile_n", "tile_k"))
def mx_matmul_pallas(a: jax.Array, b: jax.Array,
                     elem_format_a: str = "int8", elem_format_b: str = "int8",
                     block_size: int = 32, scale_bits: int = 8,
                     tile_m: int = 256, tile_n: int = 256,
                     tile_k: int = 512) -> jax.Array:
    """(M, K) x (K, N) -> (M, N) fp32, both operands MX-quantized along K."""
    _, mbits_a, _, _, _ = format_params(elem_format_a)
    _, mbits_b, _, _, _ = format_params(elem_format_b)
    M, K = a.shape
    K2, N = b.shape
    assert K == K2

    tm, tn, tk = min(tile_m, M), min(tile_n, N), min(tile_k, K)
    assert tk % block_size == 0 or tk == K

    pm, pn, pk = (-M) % tm, (-N) % tn, (-K) % tk
    if pm or pk:
        a = jnp.pad(a, ((0, pm), (0, pk)))
    if pk or pn:
        b = jnp.pad(b, ((0, pk), (0, pn)))
    Mp, Kp, Np = M + pm, K + pk, N + pn
    n_k = Kp // tk

    out = pl.pallas_call(
        functools.partial(_mm_kernel, block_size=block_size,
                          mbits_a=mbits_a, mbits_b=mbits_b,
                          scale_bits=scale_bits, n_k=n_k),
        grid=(Mp // tm, Np // tn, n_k),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(a.astype(jnp.float32), b.astype(jnp.float32))
    if pm or pn:
        out = out[:M, :N]
    return out
