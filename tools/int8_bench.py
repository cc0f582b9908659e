"""int8-MXU ablation: can MXINT8 matmuls beat the single-pass bf16 path?

VERDICT round-1 item 3 asks for int8 MXU execution (v5e int8 is 2x bf16
peak).  The catch: MX scales are per-32-block ALONG THE CONTRACTION AXIS,
so an int8 dot cannot absorb them in a per-output epilogue — the exact
formulations are:

  bf16      : quantized values as bf16 (exact for MXINT8 grid points),
              one full-K bf16 MXU dot                      [current path]
  int8_block: per-block partial dots — batched (nb, M, 32) x (nb, 32, N)
              int8->int32 dots, then epilogue sum_b 2^eA[m,b] * part[b,m,n]
              * 2^eB[n,b].  EXACT, but each dot contracts only K=32 of the
              MXU's 128-deep systolic array and materializes nb partial
              (M, N) planes.
  int8_fullK: one full-K int8 dot with PER-ROW (whole-axis) shared
              exponents — NOT the MX operating point (block_size=K), shown
              as the int8 speed-of-light for comparison.

Run on the real chip:  python tools/int8_bench.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(step, x0, n0=2, n1=12, reps=3):
    """Chained-dispatch timing (see bench.py): seconds per call.
    ``step(x) -> x`` must depend on its compute (no DCE)."""
    step = jax.jit(step)

    @jax.jit
    def fetch(x):
        return jnp.sum(x.astype(jnp.float32))

    _ = np.asarray(fetch(step(x0)))

    def chain(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            o = x0
            for _ in range(n):
                o = step(o)
            _ = np.asarray(fetch(o))
            best = min(best, time.perf_counter() - t0)
        return best

    return (chain(n1) - chain(n0)) / (n1 - n0)


def pow2i(e):
    return jax.lax.bitcast_convert_type(
        ((jnp.clip(e, -126, 127) + 127) << 23).astype(jnp.int32),
        jnp.float32)


def encode_int8(x, bs):
    """(R, K) -> int8 mantissas (R, K), block exps (R, K//bs) int32."""
    R, K = x.shape
    xb = x.reshape(R, K // bs, bs)
    bits = jax.lax.bitcast_convert_type(xb, jnp.int32) & 0x7FFFFFFF
    e = (jnp.max(bits, axis=-1, keepdims=True) >> 23) - 127
    m = jnp.round(xb * pow2i(-e) * 64.0)
    return (jnp.clip(m, -127, 127).astype(jnp.int8).reshape(R, K),
            e[..., 0])


def main():
    # DiT-XL/2 qkv linear shape, quarter-batch rows (full-M runs wedged the
    # remote chip twice; TFLOP/s is M-invariant at these sizes)
    M, K, N = 16 * 256, 1152, 3456
    bs = 32
    nb = K // bs
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(M, K).astype(np.float32))
    b = jnp.asarray(rng.randn(N, K).astype(np.float32))  # weight (out, in)

    ma, ea = encode_int8(a, bs)       # (M, K), (M, nb)
    mb, eb = encode_int8(b, bs)       # (N, K), (N, nb)
    # bf16 operands: decoded grid values (the serving path's layout)
    va = (ma.astype(jnp.float32) * (1 / 64.0) *
          jnp.repeat(pow2i(ea), bs, -1)).astype(jnp.bfloat16)
    vb = (mb.astype(jnp.float32) * (1 / 64.0) *
          jnp.repeat(pow2i(eb), bs, -1)).astype(jnp.bfloat16)

    # ---- bf16 single-pass (current path) ----
    def f_bf16(x):
        out = jnp.matmul(x, vb.T, preferred_element_type=jnp.float32)
        return x + jnp.sum(out).astype(x.dtype) * 1e-30

    t_bf16 = timed(f_bf16, va)
    flops = 2 * M * K * N
    print(f"bf16 single-pass        : {t_bf16*1e6:8.0f} us  "
          f"{flops/t_bf16/1e12:7.1f} TFLOP/s", flush=True)

    # ---- int8 per-block partials (exact MX semantics) ----
    # accumulate block-by-block (a fori over nb): materializing the full
    # (nb, M, N) int32 partial stack is 8 GB — the first formulation hung
    # the chip.  Even so, each block dot contracts only K=32 of the
    # 128-deep MXU and the f32 epilogue touches M*N per block.
    mb3 = mb.reshape(N, nb, bs).transpose(1, 2, 0)      # (nb, 32, N)
    sa = pow2i(ea).T[:, :, None] * (1 / 64.0)           # (nb, M, 1)
    sb = pow2i(eb).T[:, None, :] * (1 / 64.0)           # (nb, 1, N)

    # the chained-timing protocol at nb=36 never completed on the remote
    # chip (the fori-of-36-int8-dots + per-block M*N f32 epilogue is ~8 GB
    # of epilogue HBM traffic per call); probe ONE scaled-down instance
    # (nb_p blocks) and extrapolate per-block cost linearly
    nb_p = 4
    Kp = nb_p * bs

    def f_int8_block(x):
        x3 = x.reshape(M, nb_p, bs).transpose(1, 0, 2)  # (nb_p, M, 32)

        def body(b, acc):
            part = jax.lax.dot_general(
                x3[b], mb3[b], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)       # (M, N)
            return acc + part.astype(jnp.float32) * sa[b] * sb[b]

        out = jax.lax.fori_loop(0, nb_p, body,
                                jnp.zeros((M, N), jnp.float32))
        return x + (jnp.sum(out) * 1e-30).astype(jnp.int8)



    # ---- int8 full-K, per-row scales (speed-of-light reference) ----
    ma_r, ea_r = encode_int8(a, K)    # block = whole axis
    mb_r, eb_r = encode_int8(b, K)
    sa_r = pow2i(ea_r) * (1 / 64.0)
    sb_r = pow2i(eb_r) * (1 / 64.0)

    def f_int8_fullk(x):
        acc = jax.lax.dot_general(x, mb_r, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * sa_r * sb_r.T
        return x + (jnp.sum(out) * 1e-30).astype(jnp.int8)

    t_row = timed(f_int8_fullk, ma_r)
    print(f"int8 full-K row-scale   : {t_row*1e6:8.0f} us  "
          f"{flops/t_row/1e12:7.1f} TFLOP/s", flush=True)

    t_probe = timed(f_int8_block, ma[:, :Kp], n0=1, n1=5, reps=2)
    t_blk = t_probe * (nb / nb_p)   # linear in block count
    print(f"int8 per-32-blk (extrap): {t_blk*1e6:8.0f} us  "
          f"{flops/t_blk/1e12:7.1f} TFLOP/s  "
          f"(probe {nb_p} blocks: {t_probe*1e6:.0f} us)", flush=True)


if __name__ == "__main__":
    main()
