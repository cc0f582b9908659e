"""Generate golden top-k attention outputs from the REFERENCE code path.

Reproduces the reference QuantizedAttention flow (workloads/deit/scripts/
main.py:100-152) using the reference's own libraries: mx.matmul +
funcs.exponent_based_prediction (the working examples/deit variant for
ex_pred) + torch.topk + scatter.  Saves q/k/v inputs and attention outputs
per predictor mode to tests/golden/attention.npz.

Usage: python tests/make_golden_attention.py   (requires /root/reference)
"""

import importlib.util
import os
import sys
import types

import numpy as np

REF = "/root/reference"
sys.path.insert(0, os.path.join(REF, "microxscaling"))

import torch  # noqa: E402
from mx import matmul  # noqa: E402
from mx.specs import finalize_mx_specs as ref_finalize  # noqa: E402

# import the working predictor module directly (funcs/__init__ hardcodes
# author paths; examples/deit copy has the non-broken exponent_based_sign)
def _load_module(path, name, package_stubs=()):
    for stub in package_stubs:
        if stub not in sys.modules:
            m = types.ModuleType(stub)
            m.write_data = lambda *a, **k: None
            sys.modules[stub] = m
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


pred_deit = _load_module(
    os.path.join(REF, "microxscaling/examples/deit/exponent_based_prediction.py"),
    "ref_pred_deit")
pred_funcs = _load_module(
    os.path.join(REF, "funcs/exponent_based_prediction.py"),
    "ref_pred_funcs", package_stubs=["funcs", "funcs.utils"])

SPECS = ref_finalize({
    "w_elem_format": "int8", "a_elem_format": "int8", "scale_bits": 8,
    "block_size": 32, "bfloat": 0, "round": "nearest",
    "quantize_backprop": False, "custom_cuda": False,
})


def reference_attention(q, k, v, kk, mode):
    """The reference top-k attention flow (deit main.py:100-152)."""
    scale = q.shape[-1] ** -0.5
    true_scores = matmul(q, k.transpose(-2, -1), mx_specs=SPECS,
                         mode_config="aa") * scale
    idx = None
    pred = None
    if mode == "dense":
        attn = torch.softmax(true_scores, dim=-1)
    else:
        if mode == "true_topk":
            pred = true_scores
            vals, idx = torch.topk(true_scores, kk, dim=-1, largest=True,
                                   sorted=True)
        else:
            if mode in ("ex_pred", "true_ex"):
                obj = pred_deit.exponent_approximation(q, k, SPECS)
                if mode == "ex_pred":
                    aq, ak = obj.exponent_based_sign()
                else:
                    aq, ak = obj.exponent_based_sign_leading_ones()
            else:
                obj = pred_funcs.exponent_approximation(q, k, SPECS)
                aq, ak = getattr(obj, mode)()
            pred = aq @ ak.transpose(-2, -1)
            _, idx = torch.topk(pred, kk, dim=-1, largest=True, sorted=True)
            vals = true_scores.gather(dim=-1, index=idx)
        attn = torch.zeros_like(true_scores)
        attn.scatter_(-1, idx, torch.softmax(vals, dim=-1))
    out = matmul(attn, v, mx_specs=SPECS, mode_config="aa")
    return out, idx, pred


def main():
    rng = np.random.RandomState(0)
    B, H, N, D = 2, 3, 64, 64
    q = torch.tensor(rng.randn(B, H, N, D).astype(np.float32))
    k = torch.tensor(rng.randn(B, H, N, D).astype(np.float32))
    v = torch.tensor(rng.randn(B, H, N, D).astype(np.float32))
    kk = 16

    save = {"q": q.numpy(), "k": k.numpy(), "v": v.numpy(),
            "kk": np.array(kk)}
    for mode in ["dense", "true_topk", "ex_pred", "true_ex",
                 "two_step_leading_ones", "MXINT4", "partial_Q",
                 "partial_K"]:
        out, idx, pred = reference_attention(q, k, v, kk, mode)
        save[f"out_{mode}"] = out.numpy()
        if idx is not None:
            save[f"idx_{mode}"] = idx.numpy()
            save[f"pred_{mode}"] = pred.numpy()
        print(mode, float(out.abs().mean()))
    out_dir = os.path.join(os.path.dirname(__file__), "golden")
    np.savez_compressed(os.path.join(out_dir, "attention.npz"), **save)
    print("wrote attention.npz")


if __name__ == "__main__":
    main()
