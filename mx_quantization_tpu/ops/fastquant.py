"""Fast float-domain MX quantization for the TPU serving path.

``custom_tpu="fused"`` tier-1: pure-XLA ops (reshape / integer-bits max /
bitcast power-of-two scales / round-half-away) that XLA fuses into one VPU
pass, feeding bf16 MXU matmuls.  Numerics match the bit-exact emulation
(ops/mx.py) for all normal-range fp32 inputs; fp32-subnormal inputs flush
(TPU flushes them in arithmetic anyway) — the emulation path remains the
oracle for bit-level parity.

Covers the reference's operating points: the int grids (int8/int4/int2)
AND the MXFP element formats (fp8_e5m2/e4m3, fp6_e3m2/e2m3, fp4_e2m1),
shared_exp_method="max", round="nearest", scale_bits=8, block 32.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..formats import format_params

_INT_FMTS = ("int8", "int4", "int2")
_FP_FMTS = ("fp8_e5m2", "fp8_e4m3", "fp6_e3m2", "fp6_e2m3", "fp4_e2m1",
            "fp4")


def mesh_auto_axes(m) -> dict:
    """Axis name -> size for the mesh axes NOT already manual (inside a
    shard_map every mapped axis is Manual — re-mapping them is an error)."""
    try:
        types = m.axis_types
        return {n: m.shape[n] for n, t in zip(m.axis_names, types)
                if "Manual" not in str(t)}
    except AttributeError:
        return dict(m.shape)


def ambient_mesh():
    """The mesh set via jax.set_mesh / jax.sharding.use_mesh (None when
    unset, single-device, or fully inside a shard_map manual region).
    Mosaic kernels cannot be auto-partitioned by GSPMD — under a
    multi-device mesh the Pallas fast paths shard_map themselves (the
    attention kernel over (data->batch, model->heads); the quantize
    kernel over (data->batch, model->feature blocks) — see
    _shard_mapped_quantize).  MULTI-CHIP CONTRACT: run sharded steps
    under ``with jax.set_mesh(mesh)`` so the kernels can see the mesh at
    trace time."""
    try:
        m = jax.sharding.get_abstract_mesh()
    except AttributeError:
        return None
    if m is None or getattr(m, "empty", False) or m.size <= 1:
        return None
    auto = mesh_auto_axes(m)
    if not auto or all(v <= 1 for v in auto.values()):
        return None
    return m


def fused_eligible(specs, *fmts) -> bool:
    """Can these specs take the fast path for the given element formats?"""
    if specs is None or specs.custom_tpu != "fused":
        return False
    if any(f not in _INT_FMTS + _FP_FMTS for f in fmts):
        return False
    return (specs.shared_exp_method == "max"
            and (specs.round_mx_output or "nearest") == "nearest"
            and specs.fp == 0 and specs.bfloat in (0, 16, 32)
            and specs.block_size > 0)


def bf16_round_half_away(x: jax.Array) -> jax.Array:
    """Round f32 to the bfloat16 grid with round="nearest" (half-away-from-
    zero) — BIT-EXACT with the emulation's quantize_elemwise_op(bfloat=16).

    bf16 is the top 16 bits of f32, so: add 0x8000 to the magnitude bits
    (rounds half-ulp ties away from zero, carrying into the exponent exactly
    like the shift-round-shift reference scheme, cpp/quantize.cuh:31-56) and
    truncate.  Overflow carries to Inf (saturate_normals=False contract);
    Inf/NaN pass through.  Three fused VPU int ops — same cost class as the
    hardware RNE cast it replaces, without the tie-class divergence.
    """
    b = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    mag = b & 0x7FFFFFFF
    rounded = (mag + 0x8000) & ~0xFFFF
    out_mag = jnp.where(mag >= 0x7F800000, mag, rounded)  # Inf/NaN keep
    out = out_mag | (b & jnp.int32(-2147483648))
    return jax.lax.bitcast_convert_type(out, jnp.float32)


def bf_fast(x, specs):
    """Fast elementwise format: bfloat16 -> exact half-away round; 0/32 ->
    identity.

    bfloat=32 is 1s+8e+23m — exactly the fp32 grid, so quantizing an fp32
    tensor to it is the identity (the reference DeiT/PixArt operating points,
    deit main.py:716-736 / text_local_inference_alpha.py:108-124, both use
    bfloat=32).  bfloat=16 (the DiT operating point, sample.py:36-52) uses
    the bit-exact half-away rounding above."""
    if specs.bfloat == 16:
        if x.dtype == jnp.bfloat16:
            return x  # already on the bf16 grid
        return bf16_round_half_away(x).astype(x.dtype)
    return x


def quantize_mx_fast(x: jax.Array, elem_format: str, block_size: int,
                     scale_bits: int = 8, axis: int = -1,
                     out_dtype=jnp.bfloat16, flush: bool = False) -> jax.Array:
    """MX fake-quantize along ``axis`` (last or any), float-domain.

    Returns the quantized values in ``out_dtype`` (bf16 exact for int grids).
    """
    ebits, mbits, emax, max_norm, _ = format_params(elem_format)
    axis = axis % x.ndim
    x = x.astype(jnp.float32)

    n = x.shape[axis]
    pad = (-n) % block_size
    if pad:
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        x = jnp.pad(x, widths)
    nb = (n + pad) // block_size
    shape = x.shape[:axis] + (nb, block_size) + x.shape[axis + 1:]
    xb = x.reshape(shape)
    baxis = axis + 1

    bits = jax.lax.bitcast_convert_type(xb, jnp.int32) & 0x7FFFFFFF
    mb = jnp.max(bits, axis=baxis, keepdims=True)
    if flush:
        # mx_flush_fp32_subnorms: zero out blocks whose max |x| is an fp32
        # subnormal (mx_ops.py:282-283 semantics; the PixArt-alpha operating
        # point).  mb < 2^23 covers exactly the subnormal-max blocks; the
        # all-zero block it also matches is already zero.
        xb = jnp.where(mb >= 0x00800000, xb, jnp.zeros_like(xb))
    e = (mb >> 23) - 127 - emax  # shared exp offset by elem emax (fp fmts)
    scale_emax = 2 ** (scale_bits - 1) - 1
    e = jnp.clip(e, -scale_emax, scale_emax)

    inv_scale = jax.lax.bitcast_convert_type(
        ((-e + 127) << 23).astype(jnp.int32), jnp.float32)
    scale = jax.lax.bitcast_convert_type(
        ((e + 127) << 23).astype(jnp.int32), jnp.float32)

    scaled = xb * inv_scale
    out = _elemwise_grid_round(scaled, ebits, mbits, max_norm) * scale

    out = out.reshape(x.shape).astype(out_dtype)
    if pad:
        out = jax.lax.slice_in_dim(out, 0, n, axis=axis)
    return out


def _elemwise_grid_round(scaled, ebits, mbits, max_norm):
    """Round ``scaled`` to the element grid, float-domain.

    int grids (ebits==0): fixed spacing 2^-(mbits-2), clamp at the int max.
    fp grids: private exponent floor(log2|x|) clamped at the format minimum
    normal (denorms keep reduced precision), mantissa rounded half-away,
    saturate at max_norm — quantize_elemwise_core semantics with
    saturate_normals=True, allow_denorm=True, round="nearest"
    (the quantize_mx contract, ops/mx.py).
    """
    if ebits == 0:
        half = float(2 ** (mbits - 2))
        qmax = float(2 ** (mbits - 1) - 1)
        s = scaled * half
        q = jnp.sign(s) * jnp.floor(jnp.abs(s) + 0.5)
        return jnp.clip(q, -qmax, qmax) * (1.0 / half)

    min_exp = -(2 ** (ebits - 1)) + 2
    b = jax.lax.bitcast_convert_type(scaled, jnp.int32) & 0x7FFFFFFF
    pe = jnp.maximum((b >> 23) - 127, min_exp)   # private exponent
    # spacing = 2^(pe - (mbits-2)); |pe| stays in normal-exponent range for
    # MX-scaled inputs (|scaled| <= 2^(emax+1))
    sp_e = jnp.clip(pe - (mbits - 2), -126, 127)
    spacing = jax.lax.bitcast_convert_type(
        ((sp_e + 127) << 23).astype(jnp.int32), jnp.float32)
    inv_spacing = jax.lax.bitcast_convert_type(
        ((-sp_e + 127) << 23).astype(jnp.int32), jnp.float32)
    s = scaled * inv_spacing                     # |s| < 2^(mbits-1), exact
    q = jnp.sign(s) * jnp.floor(jnp.abs(s) + 0.5)
    out = q * spacing
    return jnp.clip(out, -max_norm, max_norm)    # saturate_normals=True


def quantize_mx_serving(x: jax.Array, elem_format: str, block_size: int,
                        scale_bits: int = 8, axis: int = -1,
                        out_dtype=jnp.bfloat16, flush: bool = False,
                        bfloat: int = 0) -> jax.Array:
    """Serving-path MX quantize: route to the one-pass Pallas kernel on TPU.

    The XLA lowering of the blocked reshape (quantize_mx_fast) costs ~7x the
    memory-bound ideal on TPU (minor-dim-32 relayouts); the Pallas kernel
    (kernels/quantize.py) is a single HBM read+write.  Identical values —
    parity is covered by tests/test_fastpath.py; non-TPU backends and ragged
    block tails keep the XLA path.
    """
    axis = axis % x.ndim
    K = x.shape[axis]
    if (axis == x.ndim - 1 and K % block_size == 0
            and jax.default_backend() == "tpu" and x.size >= (1 << 16)):
        from .kernels.quantize import mx_quantize_pallas
        # the bfloat=16 elementwise round fuses INTO the kernel (a separate
        # XLA pass feeding a Pallas kernel costs a full HBM round-trip)
        kern = partial(mx_quantize_pallas, elem_format=elem_format,
                       block_size=block_size, scale_bits=scale_bits,
                       out_dtype=out_dtype, flush=flush, bfloat=bfloat)
        mesh = ambient_mesh()
        if mesh is None:
            return kern(x)
        sharded = _shard_mapped_quantize(kern, mesh, x, block_size)
        if sharded is not None:
            return sharded
    if bfloat == 16 and x.dtype != jnp.bfloat16:
        # bf16 inputs already sit on the bf16 grid — the round is an exact
        # identity there (same dtype gate as the Pallas kernel's)
        x = bf16_round_half_away(x)
    return quantize_mx_fast(x, elem_format, block_size, scale_bits,
                            axis=axis, out_dtype=out_dtype, flush=flush)


def gelu_quantize_serving(x: jax.Array, specs, approximate: bool = True):
    """Fused GELU + MX quantize of the fc2 input (serving tier).

    Returns the MX-grid fc2 operand in bf16 when the one-pass kernel
    applies (last-axis block-aligned, TPU, big enough to amortize), or
    None — the caller keeps the unfused gelu + quantize chain.  Under an
    ambient mesh the kernel shard_maps exactly like quantize_mx_serving.
    """
    bs = specs.block_size
    K = x.shape[-1]
    if not (K % bs == 0 and jax.default_backend() == "tpu"
            and x.size >= (1 << 16)):
        return None
    from .kernels.quantize import gelu_quantize_pallas
    kern = partial(gelu_quantize_pallas, elem_format=specs.a_elem_format,
                   block_size=bs, scale_bits=specs.effective_scale_bits(),
                   flush=specs.mx_flush_fp32_subnorms, bfloat=specs.bfloat,
                   approximate=approximate)
    mesh = ambient_mesh()
    if mesh is None:
        return kern(x)
    return _shard_mapped_quantize(kern, mesh, x, bs)


def _shard_mapped_quantize(kern, mesh, x, block_size):
    """Run the Pallas quantize kernel under a multi-device mesh.

    Mosaic kernels cannot be auto-partitioned by GSPMD — same constraint
    as the attention kernel (kernels/topk_attention.py SPMD section), so
    the kernel shard_maps itself.  MX blocks are independent per
    ``block_size`` elements, so BOTH of these mappings are value-exact:

      * leading (batch) axis over "data" when it divides, and
      * the LAST (quantized) axis over "model" when each shard keeps
        whole blocks.

    Mapping the feature axis over "model" keeps the row-parallel TP
    consumers (proj/fc2 — mesh.py rules) comm-free: their inputs arrive
    feature-sharded and contract shard-locally.  Column-parallel
    consumers (qkv/fc1) need the feature axis replicated again, but the
    reshard moves the QUANTIZED bf16 tensor — half the bytes of
    resharding the f32 input before a batch-only-mapped kernel.
    Returns None when no mesh axis maps (caller falls back to the
    XLA-partitionable formulation).
    """
    from jax.sharding import PartitionSpec as P
    auto = mesh_auto_axes(mesh)
    spec = [None] * x.ndim
    dd = auto.get("data", 1)
    if x.ndim > 1 and dd > 1 and x.shape[0] % dd == 0:
        spec[0] = "data"
    dm = auto.get("model", 1)
    if (dm > 1 and x.shape[-1] % dm == 0
            and (x.shape[-1] // dm) % block_size == 0
            and x.shape[-1] // dm >= 128):  # keep lanes full per shard
        spec[-1] = "model"
    if all(s is None for s in spec):
        return None
    import jax as _jax
    pspec = P(*spec)
    try:
        f = _jax.shard_map(kern, mesh=mesh, in_specs=(pspec,),
                           out_specs=pspec, check_vma=False)
    except TypeError:  # older kwarg name
        f = _jax.shard_map(kern, mesh=mesh, in_specs=(pspec,),
                           out_specs=pspec, check_rep=False)
    return f(x)
