"""Generate golden quantization outputs from the reference implementation.

Runs the reference's pure-torch CPU quantizers (the project's numerics oracle,
see reference microxscaling/README.md "Testing") over a battery of inputs and
stores inputs/outputs as .npz under tests/golden/.  The JAX implementation is
then tested against these files — tests stay self-contained without the
reference checkout.

Usage (requires /root/reference to exist):
    python tests/make_golden.py
"""

import os
import sys

import numpy as np

REF = "/root/reference/microxscaling"
sys.path.insert(0, REF)

import torch  # noqa: E402
from mx import mx_ops, elemwise_ops  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(__file__), "golden")
os.makedirs(OUT_DIR, exist_ok=True)

SPEC_KEYS = dict(
    scale_bits=8, shared_exp_method="max", mx_flush_fp32_subnorms=False,
    custom_cuda=False,
)


def spec_dict(**kw):
    d = {
        "scale_bits": 8,
        "block_size": 32,
        "shared_exp_method": "max",
        "mx_flush_fp32_subnorms": False,
        "custom_cuda": False,
        "bfloat": 0,
        "fp": 0,
        "bfloat_subnorms": True,
        "round": "nearest",
    }
    d.update(kw)
    return d


def all_encodings(ebits, mbits, device="cpu"):
    """Enumerate every representable eXmY float (reference
    tests/common_lib.py:141-180 strategy: exhaustive grid of sign x exp x
    mantissa, including subnorms)."""
    vals = [0.0]
    emin = 2 - 2 ** (ebits - 1) if ebits > 0 else 0
    emax = 2 ** (ebits - 1) - 1 if ebits > 0 else 0
    for e in range(emin, emax + 1):
        for m in range(2 ** mbits):
            frac = 1.0 + m / 2 ** mbits
            vals.append(frac * 2.0 ** e)
    # subnorms
    for m in range(1, 2 ** mbits):
        vals.append((m / 2 ** mbits) * 2.0 ** emin)
    vals = np.array(vals, dtype=np.float32)
    return np.concatenate([vals, -vals])


def main():
    rng = np.random.RandomState(0)
    tensors = {
        "normal_2d": rng.randn(7, 67).astype(np.float32),
        "normal_3d": rng.randn(3, 9, 64).astype(np.float32) * 10,
        "tiny": (rng.randn(4, 96).astype(np.float32) * 1e-38),
        "mixed_scale": (rng.randn(5, 64).astype(np.float32) *
                        np.logspace(-30, 30, 64, dtype=np.float32)),
        "with_zeros": np.where(rng.rand(6, 32) < 0.3, 0.0,
                               rng.randn(6, 32)).astype(np.float32),
        "e5m2_grid": all_encodings(5, 2).reshape(1, -1),
        "e8m4_grid": all_encodings(8, 4)[:4096].reshape(8, -1),
    }

    # ---- elementwise quantization goldens
    elem_cases = []
    for fmt in ["int8", "int4", "fp8_e4m3", "fp8_e5m2", "fp6_e3m2",
                "fp6_e2m3", "fp4_e2m1", "fp16", "bf16"]:
        for rnd in ["nearest", "even", "floor"]:
            elem_cases.append(("elem", fmt, rnd))
    save = {}
    for tname, arr in tensors.items():
        t = torch.tensor(arr)
        save[f"in_{tname}"] = arr
        for kind, fmt, rnd in elem_cases:
            out = elemwise_ops._quantize_elemwise(
                t, fmt, round=rnd, custom_cuda=False,
                saturate_normals=True, allow_denorm=True)
            save[f"elem_{tname}_{fmt}_{rnd}_sat"] = out.numpy()
            out2 = elemwise_ops._quantize_elemwise(
                t, fmt, round=rnd, custom_cuda=False,
                saturate_normals=False, allow_denorm=False)
            save[f"elem_{tname}_{fmt}_{rnd}_inf"] = out2.numpy()
        for bf in [16, 12, 24]:
            for rnd in ["nearest", "even"]:
                out = elemwise_ops._quantize_bfloat(t, bf, round=rnd)
                save[f"bfloat_{tname}_{bf}_{rnd}"] = out.numpy()
        for fp in [10, 16]:
            out = elemwise_ops._quantize_fp(t, exp_bits=5,
                                            mantissa_bits=fp - 6,
                                            round="nearest")
            save[f"fp_{tname}_{fp}_nearest"] = out.numpy()
    np.savez_compressed(os.path.join(OUT_DIR, "elemwise.npz"), **save)
    print(f"elemwise.npz: {len(save)} arrays")

    # ---- MX block quantization goldens
    save = {}
    for tname, arr in tensors.items():
        t = torch.tensor(arr)
        save[f"in_{tname}"] = arr
        for fmt in ["int8", "int4", "int2", "fp8_e4m3", "fp8_e5m2",
                    "fp6_e3m2", "fp4_e2m1"]:
            for bs in [32, 16, 9]:
                for axis in [-1, 0]:
                    for flush in [False, True]:
                        for sb in [8, 5]:
                            key = f"mx_{tname}_{fmt}_bs{bs}_ax{axis}_fl{int(flush)}_sb{sb}"
                            out = mx_ops._quantize_mx(
                                t.clone(), sb, fmt,
                                shared_exp_method="max", axes=[axis],
                                block_size=bs, round="nearest",
                                flush_fp32_subnorms=flush,
                                custom_cuda=False)
                            save[key] = out.numpy()
        # shared_exp_method=none
        out = mx_ops._quantize_mx(t.clone(), 8, "int8",
                                  shared_exp_method="none", axes=[-1],
                                  block_size=32, round="nearest",
                                  flush_fp32_subnorms=False,
                                  custom_cuda=False)
        save[f"mxnone_{tname}_int8"] = out.numpy()
    np.savez_compressed(os.path.join(OUT_DIR, "mx.npz"), **save)
    print(f"mx.npz: {len(save)} arrays")


if __name__ == "__main__":
    main()
