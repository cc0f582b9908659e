"""Generate FULL-MODEL golden outputs from the reference torch DeiT.

Builds a debug-scale timm-style VisionTransformer in torch, runs it through
the reference's OWN surgery (`apply_quantization_to_deit`,
/root/reference/workloads/deit/scripts/main.py:231-318) with the reference
QuantizedAttention/QuantizedMlp modules (main.py:40-229) at the EXACT DeiT
operating point (main.py:716-736: MXINT8 w/a, scale 8, block 32, bfloat=32),
and records end-to-end logits per pred_mode.

Pins, per round-2 verdict missing #1:
  * the surgery gating rules: block 11 always top_k=False with
    pred_mode=exclude_block_type (main.py:264-281), exclude_blocks keep
    top-k but fall back to exclude_block_type (main.py:282-299)
  * the Quantized module wiring: qkv/proj/fc1/fc2 via mx.Linear, scores and
    PV via mx.matmul 'aa', scatter-softmax top-k, unquantized norms/GELU
  * the torch->JAX converter (utils/checkpoint.load_deit_checkpoint) end
    to end, timm state_dict names included

The ViT skeleton (patch embed, cls token, pre-norm blocks) is the standard
timm architecture the reference models build on (workloads/deit/models.py
deit_* via timm VisionTransformer) — written locally because timm is not
installed here; the REFERENCE-owned parts (quantized modules + surgery) are
imported from the reference source itself.

torch.topk tie order is pinned to lowest-index-first exactly as in
make_golden_model.py (see the note there).

Usage: python tests/make_golden_deit.py   (requires /root/reference)
"""

import os
import sys
import types

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

# reuse the mx/funcs/timm-shim scaffolding (fixes funcs.exponent_based_sign,
# stubs timm.models.vision_transformer / timm.layers.helpers, loads mx)
import make_golden_model as gm  # noqa: E402  (executes the shims)

import torch  # noqa: E402
import torch.nn as nn  # noqa: E402

REF = "/root/reference"
OUT_DIR = os.path.join(HERE, "golden")


# ---- extra shims for deit/scripts/main.py's import block -------------
def _stub(name, **attrs):
    m = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


_noop = lambda *a, **k: None  # noqa: E731
_stub("timm.data", Mixup=_noop)
_stub("timm.models", create_model=_noop)
_stub("timm.loss", LabelSmoothingCrossEntropy=_noop,
      SoftTargetCrossEntropy=_noop)
_stub("timm.scheduler", create_scheduler=_noop)
_stub("timm.optim", create_optimizer=_noop)
_stub("timm.utils", NativeScaler=_noop, get_state_dict=_noop,
      ModelEma=_noop)
_stub("timm.models.layers", DropPath=_noop, to_2tuple=gm.to_2tuple,
      trunc_normal_=_noop)
_stub("timm.models.registry", register_model=lambda f: f)
for loc in ("datasets", "engine", "losses", "samplers", "augment",
            "utils", "models", "models_v2"):
    _stub(loc, build_dataset=_noop, train_one_epoch=_noop, evaluate=_noop,
          DistillationLoss=_noop, RASampler=_noop,
          new_data_aug_generator=_noop)
try:
    import scipy.stats  # noqa: F401
except Exception:
    _stub("scipy", )
    _stub("scipy.stats", spearmanr=_noop)

# main.py pulls a few more names from funcs than make_golden_model stubbed
_funcs = sys.modules["funcs"]
for extra in ("init_analysis_files", "_modified_gram_schmidt"):
    if not hasattr(_funcs, extra):
        setattr(_funcs, extra, _noop)

ref_main = gm._load_module(
    os.path.join(REF, "workloads/deit/scripts/main.py"), "ref_deit_main")


# ---- debug-scale timm-style ViT (state_dict names == timm) -----------
class TimmAttention(nn.Module):
    def __init__(self, dim, num_heads, qkv_bias=True):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)
        self.attn_drop = nn.Dropout(0.0)
        self.proj_drop = nn.Dropout(0.0)

    def forward(self, x):
        B, N, C = x.shape
        qkv = (self.qkv(x).reshape(B, N, 3, self.num_heads, self.head_dim)
               .permute(2, 0, 3, 1, 4))
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class TimmMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.drop = nn.Dropout(0.0)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class TimmBlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TimmAttention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = TimmMlp(dim, int(dim * mlp_ratio))
        self.drop_path = nn.Identity()

    def forward(self, x):
        x = x + self.drop_path(self.attn(self.norm1(x)))
        x = x + self.drop_path(self.mlp(self.norm2(x)))
        return x


class DebugViT(nn.Module):
    """timm VisionTransformer skeleton at debug scale (class-token pooling,
    pre-norm blocks) with timm state_dict key names."""

    def __init__(self, img_size=32, patch_size=8, in_chans=3, embed_dim=64,
                 depth=12, num_heads=2, num_classes=10):
        super().__init__()
        self.embed_dim = embed_dim
        self.patch_embed = gm.PatchEmbed(img_size, patch_size, in_chans,
                                         embed_dim)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
        self.pos_embed = nn.Parameter(
            torch.zeros(1, self.patch_embed.num_patches + 1, embed_dim))
        self.blocks = nn.ModuleList(
            [TimmBlock(embed_dim, num_heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(embed_dim, eps=1e-6)
        self.head = nn.Linear(embed_dim, num_classes)

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed(x)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return self.head(x[:, 0])


# the EXACT DeiT operating point (main.py:716-736): bfloat=32
DEIT_SPECS_DICT = {
    "w_elem_format": "int8", "a_elem_format": "int8", "scale_bits": 8,
    "shared_exp_method": "max", "block_size": 32, "bfloat": 32, "fp": 0,
    "bfloat_subnorms": True, "round": "nearest",
    "round_mx_output": "nearest", "round_output": "nearest",
    "round_weight": "nearest", "mx_flush_fp32_subnorms": False,
    "custom_cuda": False, "quantize_backprop": False,
}

MODEL_KW = dict(img_size=32, patch_size=8, in_chans=3, embed_dim=64,
                depth=12, num_heads=2, num_classes=10)


# ELSA needs head_dim 64 (the reference hardcodes the d=64 Kronecker
# orthogonal matrix for DeiT, main.py:755-757): embed 128, 2 heads
ELSA_MODEL_KW = dict(MODEL_KW, embed_dim=128, depth=4)


def build(**overrides):
    torch.manual_seed(0)
    m = DebugViT(**{**MODEL_KW, **overrides})
    g = torch.Generator().manual_seed(43)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(0.1 * torch.randn(p.shape, generator=g))
    m.eval()
    return m


def surgered(top_k=True, k=8, approx_flag=True, pred_mode="ex_pred",
             exclude_blocks=(2,), exclude_block_type="ex_pred",
             model_kw=None, orthogonal_matrix=None):
    m = build(**(model_kw or {}))
    cfg = {"blocks": list(range(12)), "components": ["attn", "ffn"],
           "mx_specs": gm.ref_finalize(dict(DEIT_SPECS_DICT))}
    return ref_main.apply_quantization_to_deit(
        m, cfg, mx_quant=True, top_k=top_k, k=k, approx_flag=approx_flag,
        pred_mode=pred_mode, exclude_blocks=list(exclude_blocks),
        exclude_block_type=exclude_block_type,
        orthogonal_matrix=orthogonal_matrix)


def main():
    rng = np.random.RandomState(5)
    x = torch.tensor(rng.randn(2, 3, 32, 32).astype(np.float32))
    save = {"x": x.numpy()}

    torch.topk = gm._stable_topk
    modes = ["ex_pred", "two_step_leading_ones", "MXINT4", "partial_Q",
             "partial_K"]
    with torch.no_grad():
        for mode in modes:
            m = surgered(pred_mode=mode)
            save[f"out_{mode}"] = m(x).numpy()
            print(mode, float(np.abs(save[f"out_{mode}"]).mean()))
        # heterogeneous per-block predictors: excluded block 2 falls back
        # to two_step while the rest run ex_pred (surgery branch
        # main.py:282-299)
        m = surgered(pred_mode="ex_pred",
                     exclude_block_type="two_step_leading_ones")
        save["out_mixed_exclude"] = m(x).numpy()
        # true-score top-k (approx off) and dense MX (top_k False)
        m = surgered(approx_flag=False)
        save["out_true_topk"] = m(x).numpy()
        m = surgered(top_k=False, approx_flag=False)
        save["out_dense"] = m(x).numpy()
        # ELSA at model level: head_dim 64 (the reference ELSA dim),
        # depth 4 — blocks 0,1,3 ELSA top-k, block 2 excluded (falls back
        # to ex_pred); the 4-block model keeps the block-11 rule out of
        # the way so every block exercises the surgery's main branch
        om = gm.elsa_funcs._create_structured_orthogonal_matrix(dim=64)
        m = surgered(pred_mode="ELSA", model_kw=dict(embed_dim=128,
                                                     depth=4),
                     orthogonal_matrix=om)
        save["out_ELSA"] = m(x).numpy()
        save["elsa_matrix"] = om.numpy()
        print("ELSA", float(np.abs(save["out_ELSA"]).mean()))
        torch.save(m.state_dict(),
                   os.path.join(OUT_DIR, "deit_elsa_sd.pt"))
        # unquantized fp32 (no surgery at all, main.py --mx-quant gate)
        m = build()
        save["out_fp"] = m(x).numpy()
        torch.save(m.state_dict(),
                   os.path.join(OUT_DIR, "deit_model_sd.pt"))

    np.savez_compressed(os.path.join(OUT_DIR, "deit_model.npz"), **save)
    print("wrote deit_model.npz + deit_model_sd.pt")


if __name__ == "__main__":
    main()
