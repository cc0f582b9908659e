"""Bit-exact parity of the JAX quantizers against reference-generated goldens.

Golden files are produced by tests/make_golden.py from the reference's
pure-torch CPU quantizer (its own numerics oracle).  Comparisons are exact
(bit equality modulo NaN position equality).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from mx_quantization_tpu.ops import (quantize_bfloat, quantize_elemwise,
                                     quantize_fp, quantize_mx)

pytestmark = pytest.mark.slow  # heavy sweep module: fast lane skips it

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

elem_npz = np.load(os.path.join(GOLDEN, "elemwise.npz"))
mx_npz = np.load(os.path.join(GOLDEN, "mx.npz"))

TENSORS = sorted({k[3:] for k in elem_npz.files if k.startswith("in_")})


def assert_bit_equal(got, want, msg=""):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    nan_g, nan_w = np.isnan(got), np.isnan(want)
    assert (nan_g == nan_w).all(), f"NaN mismatch {msg}"
    g, w = got[~nan_g], want[~nan_w]
    bad = g != w
    if bad.any():
        i = np.argwhere(bad)[:5]
        raise AssertionError(
            f"{bad.sum()} mismatches {msg}; first at {i.tolist()}: "
            f"got {g[bad][:5]} want {w[bad][:5]}")


ELEM_KEYS = [k for k in elem_npz.files if k.startswith("elem_")]
BFLOAT_KEYS = [k for k in elem_npz.files if k.startswith("bfloat_")]
FP_KEYS = [k for k in elem_npz.files if k.startswith("fp_")]
MX_KEYS = [k for k in mx_npz.files if k.startswith("mx_") and
           not k.startswith("mxnone_")]
MXNONE_KEYS = [k for k in mx_npz.files if k.startswith("mxnone_")]


def _split_elem_key(k):
    # elem_{tname}_{fmt}_{rnd}_{sat|inf}; tname may contain underscores
    body = k[len("elem_"):]
    parts = body.split("_")
    mode = parts[-1]
    # format may be fp8_e4m3 style (two tokens)
    if parts[-3] in ("fp8", "fp6", "fp4") or (
            len(parts) >= 3 and parts[-3].startswith(("e", "fp8"))):
        pass
    # find format by matching known names from the right
    known = ["fp8_e4m3", "fp8_e5m2", "fp6_e3m2", "fp6_e2m3", "fp4_e2m1",
             "int8", "int4", "fp16", "bf16"]
    for fmt in known:
        suffix = f"_{fmt}_{parts[-2]}_{mode}"
        if body.endswith(suffix):
            tname = body[: -len(suffix)]
            return tname, fmt, parts[-2], mode
    raise ValueError(k)


@pytest.mark.parametrize("key", ELEM_KEYS)
def test_elemwise_parity(key):
    tname, fmt, rnd, mode = _split_elem_key(key)
    x = jnp.asarray(elem_npz[f"in_{tname}"])
    if mode == "sat":
        got = quantize_elemwise(x, fmt, round=rnd, saturate_normals=True,
                                allow_denorm=True)
    else:
        got = quantize_elemwise(x, fmt, round=rnd, saturate_normals=False,
                                allow_denorm=False)
    assert_bit_equal(got, elem_npz[key], key)


@pytest.mark.parametrize("key", BFLOAT_KEYS)
def test_bfloat_parity(key):
    body = key[len("bfloat_"):]
    parts = body.split("_")
    bf, rnd = int(parts[-2]), parts[-1]
    tname = "_".join(parts[:-2])
    x = jnp.asarray(elem_npz[f"in_{tname}"])
    got = quantize_bfloat(x, bf, round=rnd)
    assert_bit_equal(got, elem_npz[key], key)


@pytest.mark.parametrize("key", FP_KEYS)
def test_fp_parity(key):
    body = key[len("fp_"):]
    parts = body.split("_")
    fp, rnd = int(parts[-2]), parts[-1]
    tname = "_".join(parts[:-2])
    x = jnp.asarray(elem_npz[f"in_{tname}"])
    got = quantize_fp(x, fp, round=rnd)
    assert_bit_equal(got, elem_npz[key], key)


@pytest.mark.parametrize("key", MX_KEYS)
def test_mx_parity(key):
    # mx_{tname}_{fmt}_bs{bs}_ax{axis}_fl{flush}_sb{sb}
    body = key[len("mx_"):]
    parts = body.split("_")
    sb = int(parts[-1][2:])
    flush = bool(int(parts[-2][2:]))
    axis = int(parts[-3][2:])
    bs = int(parts[-4][2:])
    known = ["fp8_e4m3", "fp8_e5m2", "fp6_e3m2", "fp6_e2m3", "fp4_e2m1",
             "int8", "int4", "int2"]
    fmt = None
    for f in known:
        if body.endswith(f"_{f}_bs{bs}_ax{axis}_fl{int(flush)}_sb{sb}"):
            fmt = f
            break
    tname = body[: -(len(f"_{fmt}_bs{bs}_ax{axis}_fl{int(flush)}_sb{sb}"))]
    x = jnp.asarray(mx_npz[f"in_{tname}"])
    got = quantize_mx(x, sb, fmt, axes=[axis], block_size=bs,
                      round="nearest", flush_fp32_subnorms=flush)
    assert_bit_equal(got, mx_npz[key], key)


@pytest.mark.parametrize("key", MXNONE_KEYS)
def test_mx_none_method_parity(key):
    tname = key[len("mxnone_"):-len("_int8")]
    x = jnp.asarray(mx_npz[f"in_{tname}"])
    got = quantize_mx(x, 8, "int8", axes=[-1], block_size=32,
                      shared_exp_method="none", round="nearest")
    assert_bit_equal(got, mx_npz[key], key)
