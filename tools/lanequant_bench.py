"""Lane-axis (transpose-free) activation-quantize kernel probe.

The shipped mx_quantize_pallas transposes the (tm, K) tile twice inside
the kernel so the 32-wide MX blocks land on SUBLANES (Mosaic cannot
shape-cast the lane axis into 32-wide blocks).  But the only *segmented*
op in the whole pass is the per-block max — everything else is
elementwise.  This probe computes that max directly on the LANE axis
with an XOR-butterfly (pltpu.roll +/-s, select by (lane & s), 5 steps
for block 32) — the TPU analogue of the reference CUDA kernel's
__shfl_xor warp butterfly (microxscaling/mx/cpp/mx.cuh:57-91) — and
keeps the tile in its natural layout end to end.  Max is exact, so the
result must be BIT-IDENTICAL to the shipped kernel.

In-run deltas only (absolute tunnel numbers swing between sessions).

MEASURED (round 5, in-run pairs, TPU v5e):
  full-K roll butterfly:   (16384,4608) int8 bf16 524 -> 1666us (0.31x),
                           (16384,1152) 169 -> 441us; bitexact=True everywhere
  in-register (128) rolls: WORSE still (2087us / 747us) - the reshape
                           relayouts + rolls dominate
  NOMAX diagnostic floor (skip the segmented max entirely, wrong values):
                           ~= base speed (526 vs 492us at 4608/bfloat=0)
VERDICT: dead end.  pltpu.roll costs far more than the in-kernel
transpose pair, and the NOMAX floor shows the pass is VPU-bound on the
ELEMENTWISE f32 chain (bitcast/scale/round/clip ~15 ops/elem), not on
the layout or the reduction - the shipped sublane-max design is already
at the op-count floor for the bit-exact contract.  This closes the last
untried structural variant of the activation-quantize band.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import jax, numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
os.makedirs("/root/repo/.cache/jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from mx_quantization_tpu.formats import format_params
from mx_quantization_tpu.ops.kernels.quantize import (
    mx_quantize_pallas, _bf16_round_f32)


def _block_max_bits_lanes(bits, block_size):
    """Per-element broadcasted max of |bits| over aligned block_size-lane
    groups along the last axis, via XOR-butterfly rolls."""
    if os.environ.get("NOMAX"):
        # diagnostic floor: skip the segmented max entirely (WRONG values —
        # per-element "block max" = own bits) to price the butterfly
        return bits
    shp = bits.shape
    K = shp[-1]
    if K > 128 and K % 128 == 0 and block_size <= 128:
        # split lanes into 128-wide registers: the roll becomes a single
        # in-register lane rotate; XOR partners stay inside 32-groups so
        # the 128-cyclic wrap never crosses a block boundary
        bits = bits.reshape(shp[:-1] + (K // 128, 128))
    nd = bits.ndim
    R = bits.shape[-1]
    pos = jax.lax.broadcasted_iota(jnp.int32, bits.shape, nd - 1)
    m = bits
    s = 1
    while s < block_size:
        fwd = pltpu.roll(m, R - s, nd - 1)  # lane i <- lane i+s (cyclic)
        bwd = pltpu.roll(m, s, nd - 1)      # lane i <- lane i-s
        m = jnp.maximum(m, jnp.where((pos & s) == 0, fwd, bwd))
        s *= 2
    return m.reshape(shp)


def _lane_quant_kernel(x_ref, o_ref, *, block_size, mbits, scale_bits,
                       out_dtype, ebits, emax, max_norm, flush, bfloat):
    x32 = x_ref[:].astype(jnp.float32)
    if bfloat == 16:
        x32 = _bf16_round_f32(x32)
    bits = jax.lax.bitcast_convert_type(x32, jnp.int32) & 0x7FFFFFFF
    mb = _block_max_bits_lanes(bits, block_size)
    if flush:
        x32 = jnp.where(mb >= 0x00800000, x32, jnp.zeros_like(x32))
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
        scaled = x32 * inv_scale * half
        q = jnp.sign(scaled) * jnp.floor(jnp.abs(scaled) + 0.5)
        q = jnp.clip(q, -qmax, qmax)
        o_ref[:] = (q * scale * (1.0 / half)).astype(out_dtype)
        return
    scaled = x32 * inv_scale
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
    o_ref[:] = (jnp.clip(q * spacing, -max_norm, max_norm)
                * scale).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("elem_format", "block_size",
                                             "scale_bits", "out_dtype",
                                             "tile_rows", "flush", "bfloat"))
def mx_quantize_lanes(x, elem_format="int8", block_size=32, scale_bits=8,
                      out_dtype=jnp.bfloat16, tile_rows=256, flush=False,
                      bfloat=0):
    ebits, mbits, emax, max_norm, _ = format_params(elem_format)
    orig_shape = x.shape
    K = orig_shape[-1]
    assert K % block_size == 0
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
        functools.partial(_lane_quant_kernel, block_size=block_size,
                          mbits=mbits, scale_bits=scale_bits,
                          out_dtype=out_dtype, ebits=ebits, emax=emax,
                          max_norm=max_norm, flush=flush, bfloat=bfloat),
        grid=((M + pad) // tm,),
        in_specs=[pl.BlockSpec((tm, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tm, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((M + pad), K), out_dtype),
        interpret=jax.default_backend() != "tpu",
    )(x2)
    if pad:
        out = out[:M]
    return out.reshape(orig_shape)


def timed(fn, x, n0=8, n1=72, reps=4):
    fetch = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    _ = np.asarray(fetch(fn(x)))
    def run(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter(); o = x
            for _ in range(n):
                o = fn(o)
            _ = np.asarray(fetch(o)); best = min(best, time.perf_counter()-t0)
        return best
    return (run(n1) - run(n0)) / (n1 - n0)


if __name__ == "__main__":
    fmts = os.environ.get("FMTS", "int8,fp8_e4m3").split(",")
    for (M, K) in ((16384, 4608), (16384, 1152)):
        x = jax.random.normal(jax.random.key(0), (M, K), jnp.bfloat16)
        for fmt in fmts:
            for bfloat in (16, 0):
                base = jax.jit(lambda x, fmt=fmt, b=bfloat: mx_quantize_pallas(
                    x, fmt, out_dtype=jnp.bfloat16, bfloat=b))
                lane = jax.jit(lambda x, fmt=fmt, b=bfloat: mx_quantize_lanes(
                    x, fmt, out_dtype=jnp.bfloat16, bfloat=b))
                try:
                    ob = np.asarray(base(x), np.float32)
                    ol = np.asarray(lane(x), np.float32)
                    ok = np.array_equal(ob, ol)
                    tb = timed(base, x) * 1e6
                    tl = timed(lane, x) * 1e6
                    print(f"({M},{K}) {fmt} bfloat={bfloat}: "
                          f"base {tb:.0f}us lane {tl:.0f}us "
                          f"({tb/tl:.2f}x) bitexact={ok}", flush=True)
                except Exception as e:
                    print(f"({M},{K}) {fmt} bfloat={bfloat}: FAIL "
                          f"{str(e)[:160]}", flush=True)
