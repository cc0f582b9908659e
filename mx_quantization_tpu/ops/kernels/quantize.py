"""Pallas kernel: MX block fake-quantization along the last axis.

TPU-native equivalent of the reference's innermost-axis CUDA kernel
(microxscaling/mx/cpp/mx.cuh:57-91 quantize_mx_innermost_cuda_kernel): per
32-element block, max-|x| -> shared exponent -> scale -> round-to-format ->
rescale.  The warp __shfl_xor butterfly max maps to a lane-local reshape-max
on the VPU; the exponent extraction and power-of-two scales use integer bit
manipulation (exact, no transcendentals).

This kernel serves the ``custom_tpu="fused"`` fast path for the int grids
(int8/int4/int2) and the MXFP element formats (fp8/fp6/fp4) with
round="nearest" — the reference's operating points.  The general emulation
path (ops/mx.py) remains the bit-exact oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...formats import format_params


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# NOTE (Mosaic layout): the minor (lane) dimension cannot be reshaped into
# 32-wide blocks inside a TPU kernel ("unsupported shape cast"), so in-kernel
# quantization always places the shared-exponent blocks on the SUBLANE axis
# (_quantize_block_values_axis0); last-axis quantization transposes first.


def _bf16_round_f32(x):
    """Half-away bf16 rounding (see fastquant.bf16_round_half_away) —
    in-VMEM so the bfloat=16 elementwise quantize fuses into the MX
    quantize instead of costing its own HBM pass."""
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    mag = b & 0x7FFFFFFF
    rounded = (mag + 0x8000) & ~0xFFFF
    out_mag = jnp.where(mag >= 0x7F800000, mag, rounded)
    out = out_mag | (b & jnp.int32(-2147483648))
    return jax.lax.bitcast_convert_type(out, jnp.float32)


def _quantize_block_values_axis0(x, block_size: int, mbits: int,
                                 scale_bits: int, out_dtype,
                                 ebits: int = 0, emax: int = 0,
                                 max_norm: float = 0.0,
                                 flush: bool = False,
                                 bfloat: int = 0):
    """Same as _quantize_block_values but blocks along axis 0 of a 2D x
    (K, N) — the layout of the second matmul operand.  Avoids an in-kernel
    transpose.  ebits == 0: int grid; ebits > 0: MXFP grid (private
    exponent clamped at the format minimum normal, mantissa rounded
    half-away, saturate at max_norm — the quantize_mx contract)."""
    K, N = x.shape
    nb = K // block_size
    x32 = x.astype(jnp.float32)
    if bfloat == 16:
        x32 = _bf16_round_f32(x32)
    xb = x32.reshape(nb, block_size, N)

    bits = jax.lax.bitcast_convert_type(xb, jnp.int32) & 0x7FFFFFFF
    mb = jnp.max(bits, axis=1, keepdims=True)
    if flush:
        # mx_flush_fp32_subnorms: zero blocks whose max |x| is fp32-subnormal
        # (mx_ops.py:282-283; the PixArt-alpha operating point)
        xb = jnp.where(mb >= 0x00800000, xb, jnp.zeros_like(xb))
    e = (mb >> 23) - 127 - emax
    scale_emax = 2 ** (scale_bits - 1) - 1
    e = jnp.clip(e, -scale_emax, scale_emax)

    inv_scale = jax.lax.bitcast_convert_type(
        ((-e + 127) << 23).astype(jnp.int32), jnp.float32)
    scale = jax.lax.bitcast_convert_type(
        ((e + 127) << 23).astype(jnp.int32), jnp.float32)

    if ebits == 0:
        half = float(2 ** (mbits - 2))
        qmax = float(2 ** (mbits - 1) - 1)
        scaled = xb * inv_scale * half
        q = jnp.sign(scaled) * jnp.floor(jnp.abs(scaled) + 0.5)
        q = jnp.clip(q, -qmax, qmax)
        out = q * scale * (1.0 / half)
        return out.reshape(K, N).astype(out_dtype)

    scaled = xb * inv_scale
    min_exp = -(2 ** (ebits - 1)) + 2
    sb = jax.lax.bitcast_convert_type(scaled, jnp.int32) & 0x7FFFFFFF
    pe = jnp.maximum((sb >> 23) - 127, min_exp)
    sp_e = jnp.clip(pe - (mbits - 2), -126, 127)
    spacing = jax.lax.bitcast_convert_type(
        ((sp_e + 127) << 23).astype(jnp.int32), jnp.float32)
    inv_spacing = jax.lax.bitcast_convert_type(
        ((-sp_e + 127) << 23).astype(jnp.int32), jnp.float32)
    sm = scaled * inv_spacing
    q = jnp.sign(sm) * jnp.floor(jnp.abs(sm) + 0.5)
    out = jnp.clip(q * spacing, -max_norm, max_norm) * scale
    return out.reshape(K, N).astype(out_dtype)


def _quantize_kernel(x_ref, o_ref, *, block_size, mbits, scale_bits,
                     out_dtype, ebits, emax, max_norm, flush, bfloat):
    # transpose so K blocks land on sublanes (see layout note above)
    qt = _quantize_block_values_axis0(x_ref[:].T, block_size, mbits,
                                      scale_bits, out_dtype, ebits, emax,
                                      max_norm, flush, bfloat)
    o_ref[:] = qt.T


@functools.partial(jax.jit, static_argnames=("elem_format", "block_size",
                                             "scale_bits", "out_dtype",
                                             "tile_rows", "flush", "bfloat"))
def mx_quantize_pallas(x: jax.Array, elem_format: str = "int8",
                       block_size: int = 32, scale_bits: int = 8,
                       out_dtype=jnp.bfloat16, tile_rows: int = 256,
                       flush: bool = False, bfloat: int = 0):
    """Quantize x along its last axis to the MX grid (values, not packed).

    x: (..., K) fp32/bf16, K % block_size == 0.  Returns same shape in
    ``out_dtype`` (bf16 holds every MXINT8 grid point exactly).
    """
    ebits, mbits, emax, max_norm, _ = format_params(elem_format)
    orig_shape = x.shape
    K = orig_shape[-1]
    assert K % block_size == 0, (K, block_size)
    # keep the input dtype: a bf16 input is cast to f32 in-VMEM inside the
    # kernel, saving a full HBM round-trip vs materializing the f32 copy
    # (bf16->f32 is exact, so the result is identical)
    x2 = x.reshape(-1, K)
    if x2.dtype not in (jnp.float32, jnp.bfloat16):
        x2 = x2.astype(jnp.float32)
    if bfloat == 16 and x2.dtype == jnp.bfloat16:
        # the input already sits on the bf16 grid, so the in-kernel
        # half-away round is an exact identity (bf16->f32 keeps the low 16
        # magnitude bits zero; +0x8000 & ~0xFFFF restores them) — skip its
        # ~7 VPU int-ops/element.  Bit-exact; the serving path's bf16
        # activation storage makes this the common case.
        bfloat = 0
    M = x2.shape[0]

    # keep the working set (in tile + f32 intermediates + out tile, double
    # buffered) within the ~16MB scoped-VMEM budget for wide K
    while tile_rows > 64 and tile_rows * K * 4 * 3 > (12 << 20):
        tile_rows //= 2
    tm = min(tile_rows, M)
    # pad rows to a multiple of the tile
    pad = (-M) % tm
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_quantize_kernel, block_size=block_size,
                          mbits=mbits, scale_bits=scale_bits,
                          out_dtype=out_dtype, ebits=ebits, emax=emax,
                          max_norm=max_norm, flush=flush, bfloat=bfloat),
        grid=((M + pad) // tm,),
        in_specs=[pl.BlockSpec((tm, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tm, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((M + pad), K), out_dtype),
        interpret=_use_interpret(),
    )(x2)
    if pad:
        out = out[:M]
    return out.reshape(orig_shape)


def _ln_mod_quant_kernel(x_ref, sh_ref, sc_ref, o_ref, *, block_size, mbits,
                         scale_bits, out_dtype, eps, ebits, emax, max_norm,
                         flush, bfloat):
    """LayerNorm (no affine) + adaLN modulate + MX quantize, one pass.

    x (1, tm, C) -> transpose puts features on SUBLANES, so the LN mean/var
    are cheap cross-sublane reductions and the MX blocks (along C) need no
    further layout work; shift/scale arrive as (1, C, 1) per-batch columns.
    Replaces the XLA LN+modulate chain (2 HBM passes) AND the separate
    activation-quantize kernel (1 pass) with a single read+write.
    ``bfloat=16`` rounds the modulated result to the bf16 grid before MX
    quantization (the DiT operating point's elementwise quantize)."""
    xt = x_ref[0].T.astype(jnp.float32)          # (C, tm)
    C = xt.shape[0]
    mu = jnp.sum(xt, axis=0, keepdims=True) * (1.0 / C)
    xc = xt - mu
    var = jnp.sum(xc * xc, axis=0, keepdims=True) * (1.0 / C)
    xn = xc * jax.lax.rsqrt(var + eps)
    y = xn * (1.0 + sc_ref[0].astype(jnp.float32)) \
        + sh_ref[0].astype(jnp.float32)          # (C,1) broadcast over lanes
    qt = _quantize_block_values_axis0(y, block_size, mbits, scale_bits,
                                      out_dtype, ebits, emax, max_norm,
                                      flush, bfloat)
    o_ref[0] = qt.T


@functools.partial(jax.jit, static_argnames=("elem_format", "block_size",
                                             "scale_bits", "eps",
                                             "out_dtype", "tile_rows",
                                             "flush", "bfloat"))
def ln_modulate_quantize_pallas(x: jax.Array, shift: jax.Array,
                                scale: jax.Array, elem_format: str = "int8",
                                block_size: int = 32, scale_bits: int = 8,
                                eps: float = 1e-6, out_dtype=jnp.bfloat16,
                                tile_rows: int = 256, flush: bool = False,
                                bfloat: int = 0):
    """quantize_mx(modulate(LN(x), shift, scale)) along the last axis.

    x: (B, N, C); shift/scale: (B, C) adaLN vectors (DiT models.py:293-296 —
    the modulation itself stays unquantized, matching the reference; only
    the RESULT is MX-quantized as the consumer linear's activation).
    Numerics vs the unfused path: LN statistics accumulate in a different
    (sublane-tree) order — near-tie quantize flips only.
    """
    ebits, mbits, emax, max_norm, _ = format_params(elem_format)
    B, N, C = x.shape
    assert C % block_size == 0, (C, block_size)
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        x = x.astype(jnp.float32)
    shc = shift.reshape(B, C, 1).astype(jnp.float32)
    scc = scale.reshape(B, C, 1).astype(jnp.float32)

    tm = min(tile_rows, N)
    while tm > 64 and tm * C * 4 * 4 > (12 << 20):
        tm //= 2
    pad = (-N) % tm
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    Npad = N + pad

    out = pl.pallas_call(
        functools.partial(_ln_mod_quant_kernel, block_size=block_size,
                          mbits=mbits, scale_bits=scale_bits,
                          out_dtype=out_dtype, eps=eps, ebits=ebits,
                          emax=emax, max_norm=max_norm, flush=flush,
                          bfloat=bfloat),
        grid=(B, Npad // tm),
        in_specs=[
            pl.BlockSpec((1, tm, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Npad, C), out_dtype),
        interpret=_use_interpret(),
    )(x, shc, scc)
    if pad:
        out = out[:, :N]
    return out


def _gelu_f32(x, approximate: bool):
    """GELU in f32: tanh approximation (DiT/PixArt — reference Mlp
    act_layer GELU(approximate="tanh")) or the erf-exact form (DeiT —
    timm's default GELU).  Mirrors jax.nn.gelu's exact operation ORDER
    so the fused kernel is bit-identical to the unfused XLA chain in
    f32 (a different multiply association flips near-tie quantize
    decisions on the fp grids)."""
    if approximate:
        c = jnp.float32(0.7978845608028654)  # sqrt(2/pi)
        cdf = 0.5 * (1.0 + jnp.tanh(c * (x + 0.044715 * (x ** 3))))
        return x * cdf
    sqrt_half = jnp.float32(0.7071067811865476)
    return 0.5 * x * jax.lax.erfc(-x * sqrt_half)


def _gelu_quantize_kernel(x_ref, o_ref, *, block_size, mbits, scale_bits,
                          out_dtype, ebits, emax, max_norm, flush, bfloat,
                          approximate):
    g = _gelu_f32(x_ref[:].astype(jnp.float32), approximate)
    qt = _quantize_block_values_axis0(g.T, block_size, mbits, scale_bits,
                                      out_dtype, ebits, emax, max_norm,
                                      flush, bfloat)
    o_ref[:] = qt.T


@functools.partial(jax.jit, static_argnames=("elem_format", "block_size",
                                             "scale_bits", "out_dtype",
                                             "tile_rows", "flush", "bfloat",
                                             "approximate"))
def gelu_quantize_pallas(x: jax.Array, elem_format: str = "int8",
                         block_size: int = 32, scale_bits: int = 8,
                         out_dtype=jnp.bfloat16, tile_rows: int = 256,
                         flush: bool = False, bfloat: int = 0,
                         approximate: bool = True):
    """quantize_mx(GELU(x)) along the last axis — producer-side fusion of
    the MLP activation into the fc2 input quantize (round-4 verdict ask
    #2).  The reference quantizes around each op separately
    (microxscaling/mx/linear.py:62-88 quantize-around-matmul); here the
    GELU output never exists in HBM — the kernel reads the fc1 output
    once and writes the MX-grid fc2 operand, deleting the standalone
    activation-quantize pass (the largest single site of the round-4
    activation-quantize band, ~13.6 ms of the 155.7 ms serving step).

    Numerics: GELU is computed in f32 on the (bf16-exact) input values,
    then ``bfloat=16`` rounds the result to the bf16 grid before MX
    quantization — vs the XLA chain's bf16-arithmetic tanh this flips
    near-tie quantize decisions only, the same relaxation class as the
    bf16 activation storage (docs/ACCURACY.md); serving-tier wiring
    only, the exact tier keeps the unfused chain as the parity oracle.
    """
    ebits, mbits, emax, max_norm, _ = format_params(elem_format)
    orig_shape = x.shape
    K = orig_shape[-1]
    assert K % block_size == 0, (K, block_size)
    x2 = x.reshape(-1, K)
    if x2.dtype not in (jnp.float32, jnp.bfloat16):
        x2 = x2.astype(jnp.float32)
    M = x2.shape[0]

    while tile_rows > 64 and tile_rows * K * 4 * 3 > (12 << 20):
        tile_rows //= 2
    tm = min(tile_rows, M)
    pad = (-M) % tm
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_gelu_quantize_kernel, block_size=block_size,
                          mbits=mbits, scale_bits=scale_bits,
                          out_dtype=out_dtype, ebits=ebits, emax=emax,
                          max_norm=max_norm, flush=flush, bfloat=bfloat,
                          approximate=approximate),
        grid=((M + pad) // tm,),
        in_specs=[pl.BlockSpec((tm, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tm, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((M + pad), K), out_dtype),
        interpret=_use_interpret(),
    )(x2)
    if pad:
        out = out[:M]
    return out.reshape(orig_shape)
