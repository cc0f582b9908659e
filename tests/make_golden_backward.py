"""Generate QUANTIZED-BACKWARD goldens from the reference torch autograd.

The backward axes contract (reference microxscaling/mx/linear.py:105-206,
matmul.py:150-166, bmm.py) is coded in ops/linear.py but round 2 pinned only
the forward.  This runs the reference's mx.linear / mx.matmul / mx.bmm with
``quantize_backprop=True`` under torch autograd and records input/weight/
bias/operand gradients for a fixed cotangent, per mode_config, including a
non-multiple-of-32 contraction dim (block padding in the grad quantizers)
and a bfloat=16 elementwise backward.

tests/test_backward_golden.py replays these through jax.grad of our
custom_vjp ops.

Usage: python tests/make_golden_backward.py   (requires /root/reference)
"""

import os
import sys

import numpy as np

REF = "/root/reference/microxscaling"
sys.path.insert(0, REF)

import torch  # noqa: E402
from mx import linear as mx_linear_fn  # noqa: E402
from mx import matmul as mx_matmul_fn  # noqa: E402
from mx import bmm as mx_bmm_fn  # noqa: E402
from mx.specs import finalize_mx_specs  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(__file__), "golden")


def spec(bfloat=0):
    return finalize_mx_specs({
        "w_elem_format": "int8", "a_elem_format": "int8", "scale_bits": 8,
        "shared_exp_method": "max", "block_size": 32, "bfloat": bfloat,
        "fp": 0, "bfloat_subnorms": True, "round": "nearest",
        "mx_flush_fp32_subnorms": False, "custom_cuda": False,
        "quantize_backprop": True,
    })


def main():
    rng = np.random.RandomState(21)
    save = {}

    def t(a):
        return torch.tensor(a, requires_grad=True)

    # ---- linear: (B, T, in) x (out, in), in=72 exercises block padding
    for tag, (bt, inn, out), bfloat, bias in [
        ("lin32", (2, 8, 64), 0, True),
        ("lin72", (2, 7, 72), 0, True),
        ("lin_bf16", (2, 8, 64), 16, True),
        ("lin_nobias", (2, 8, 64), 0, False),
    ]:
        s = spec(bfloat)
        x = t(rng.randn(2, bt, inn).astype(np.float32))
        w = t(rng.randn(out, inn).astype(np.float32))
        b = t(rng.randn(out).astype(np.float32)) if bias else None
        o = mx_linear_fn(x, w, b, mx_specs=s)
        g = torch.tensor(rng.randn(*o.shape).astype(np.float32))
        o.backward(g)
        save[f"{tag}_x"] = x.detach().numpy()
        save[f"{tag}_w"] = w.detach().numpy()
        if bias:
            save[f"{tag}_b"] = b.detach().numpy()
            save[f"{tag}_gb"] = b.grad.numpy()
        save[f"{tag}_g"] = g.numpy()
        save[f"{tag}_out"] = o.detach().numpy()
        save[f"{tag}_gx"] = x.grad.numpy()
        save[f"{tag}_gw"] = w.grad.numpy()
        print(tag, float(np.abs(x.grad.numpy()).mean()))

    # ---- matmul per mode_config (reference matmul.py:32-43)
    for mode in ["aa", "aw", "wa"]:
        s = spec(0)
        a = t(rng.randn(2, 3, 8, 40).astype(np.float32))
        b2 = t(rng.randn(2, 3, 40, 16).astype(np.float32))
        o = mx_matmul_fn(a, b2, mx_specs=s, mode_config=mode)
        g = torch.tensor(rng.randn(*o.shape).astype(np.float32))
        o.backward(g)
        save[f"mm_{mode}_a"] = a.detach().numpy()
        save[f"mm_{mode}_b"] = b2.detach().numpy()
        save[f"mm_{mode}_g"] = g.numpy()
        save[f"mm_{mode}_out"] = o.detach().numpy()
        save[f"mm_{mode}_ga"] = a.grad.numpy()
        save[f"mm_{mode}_gb"] = b2.grad.numpy()
        print("mm", mode, float(np.abs(a.grad.numpy()).mean()))

    # ---- bmm (both operands a_elem_format, reference bmm.py:40-53)
    s = spec(0)
    a = t(rng.randn(4, 9, 33).astype(np.float32))
    b2 = t(rng.randn(4, 33, 12).astype(np.float32))
    o = mx_bmm_fn(a, b2, mx_specs=s)
    g = torch.tensor(rng.randn(*o.shape).astype(np.float32))
    o.backward(g)
    save["bmm_a"] = a.detach().numpy()
    save["bmm_b"] = b2.detach().numpy()
    save["bmm_g"] = g.numpy()
    save["bmm_out"] = o.detach().numpy()
    save["bmm_ga"] = a.grad.numpy()
    save["bmm_gb"] = b2.grad.numpy()
    print("bmm", float(np.abs(a.grad.numpy()).mean()))

    np.savez_compressed(os.path.join(OUT_DIR, "backward.npz"), **save)
    print("wrote backward.npz")


if __name__ == "__main__":
    main()
