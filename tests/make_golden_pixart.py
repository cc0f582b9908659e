"""Generate FULL-MODEL golden outputs from the reference torch PixArt.

Imports the reference's own MXPixArtTransformer2DModel + set_config cascade
(/root/reference/workloads/PixArt/models/MX_pixart_transformer_2d.py:85-218)
and MXBasicTransformerBlock / MXSelf/CrossAttention / MXFeedForward
(MX_transformer_block.py:109-859) at debug scale, runs the full forward —
patchify + adaLN-single + caption projection + blocks + final modulation +
unpatchify — at the EXACT PixArt-alpha operating point
(text_local_inference_alpha.py:108-124: MXINT8, scale 8, block 32,
bfloat=32, mx_flush_fp32_subnorms=True), and records outputs per pred_mode,
including cross-attention with a REAL ragged text mask.

This pins the most contract-dense model in the reference (round-2 verdict
missing #1):
  * set_config cascade incl. excluded blocks (self_top_k=False AND
    pred_mode=exclude_blocks_type; cross keeps its own top_k —
    MX_pixart_transformer_2d.py:203-208)
  * cross-attention mask added to BOTH true and predicted scores
    (MX_transformer_block.py:794-820)
  * the asymmetric exclude_timesteps gates (self: whole top-k skipped;
    cross: only the predictor — true-score top-k instead)
  * MX'd GELU-tanh feed-forward (net.0 GELU proj + net.2 Linear)
  * adaLN-single modulation chain + final scale_shift_table

diffusers is not installed here; the small diffusers modules the reference
imports (PatchEmbed sincos, AdaLayerNormSingle, PixArtAlphaTextProjection,
ConfigMixin plumbing) are implemented locally below with diffusers
semantics.  The REFERENCE-owned quantization/attention/block code is
imported from the reference source itself.

torch.topk tie order pinned lowest-index-first as in make_golden_model.py.

Usage: python tests/make_golden_pixart.py   (requires /root/reference)
"""

import math
import os
import sys
import types

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

import make_golden_model as gm  # noqa: E402  (mx + funcs shims)

import torch  # noqa: E402
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

REF = "/root/reference"
OUT_DIR = os.path.join(HERE, "golden")


# ---------------------------------------------------------------------
# diffusers shims (faithful minimal implementations)
# ---------------------------------------------------------------------
def get_timestep_embedding(timesteps, embedding_dim, flip_sin_to_cos=True,
                           downscale_freq_shift=0.0):
    half_dim = embedding_dim // 2
    exponent = -math.log(10000) * torch.arange(half_dim,
                                               dtype=torch.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = torch.exp(exponent)
    emb = timesteps[:, None].float() * emb[None, :]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half_dim:], emb[:, :half_dim]], dim=-1)
    return emb


def get_2d_sincos_pos_embed(embed_dim, grid_size, base_size=16,
                            interpolation_scale=1.0):
    grid_h = (np.arange(grid_size, dtype=np.float32) /
              (grid_size / base_size) / interpolation_scale)
    grid_w = (np.arange(grid_size, dtype=np.float32) /
              (grid_size / base_size) / interpolation_scale)
    grid = np.meshgrid(grid_w, grid_h)  # w goes first (diffusers)
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])

    def emb_1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb_h = emb_1d(embed_dim // 2, grid[0])
    emb_w = emb_1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)  # (M, D)


class PatchEmbed(nn.Module):
    """diffusers.models.embeddings.PatchEmbed (PixArt flavor: layer_norm
    off, sincos pos table buffer)."""

    def __init__(self, height=128, width=128, patch_size=2, in_channels=4,
                 embed_dim=1152, interpolation_scale=1.0, **kw):
        super().__init__()
        self.patch_size = patch_size
        self.proj = nn.Conv2d(in_channels, embed_dim,
                              kernel_size=patch_size, stride=patch_size)
        grid = height // patch_size
        base_size = height // patch_size
        pe = get_2d_sincos_pos_embed(embed_dim, grid, base_size=base_size,
                                     interpolation_scale=interpolation_scale)
        self.register_buffer("pos_embed",
                             torch.tensor(pe, dtype=torch.float32)[None],
                             persistent=False)

    def forward(self, latent):
        latent = self.proj(latent)
        latent = latent.flatten(2).transpose(1, 2)
        return (latent + self.pos_embed).to(latent.dtype)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_channels, time_embed_dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_channels, time_embed_dim)
        self.act = nn.SiLU()
        self.linear_2 = nn.Linear(time_embed_dim, time_embed_dim)

    def forward(self, sample):
        return self.linear_2(self.act(self.linear_1(sample)))


class PixArtAlphaCombinedTimestepSizeEmbeddings(nn.Module):
    def __init__(self, embedding_dim, size_emb_dim,
                 use_additional_conditions=False):
        super().__init__()
        self.outdim = size_emb_dim
        self.use_additional_conditions = use_additional_conditions
        self.timestep_embedder = TimestepEmbedding(256, embedding_dim)
        if use_additional_conditions:
            self.resolution_embedder = TimestepEmbedding(256, size_emb_dim)
            self.aspect_ratio_embedder = TimestepEmbedding(256, size_emb_dim)

    def forward(self, timestep, resolution=None, aspect_ratio=None,
                batch_size=None, hidden_dtype=None):
        timesteps_proj = get_timestep_embedding(timestep, 256)
        timesteps_emb = self.timestep_embedder(
            timesteps_proj.to(dtype=hidden_dtype))
        if self.use_additional_conditions:
            res_proj = get_timestep_embedding(resolution.flatten(), 256)
            res_emb = self.resolution_embedder(
                res_proj.to(hidden_dtype)).reshape(batch_size, -1)
            ar_proj = get_timestep_embedding(aspect_ratio.flatten(), 256)
            ar_emb = self.aspect_ratio_embedder(
                ar_proj.to(hidden_dtype)).reshape(batch_size, -1)
            conditioning = timesteps_emb + torch.cat([res_emb, ar_emb],
                                                     dim=1)
        else:
            conditioning = timesteps_emb
        return conditioning


class AdaLayerNormSingle(nn.Module):
    """diffusers.models.normalization.AdaLayerNormSingle."""

    def __init__(self, embedding_dim, use_additional_conditions=False):
        super().__init__()
        self.emb = PixArtAlphaCombinedTimestepSizeEmbeddings(
            embedding_dim, size_emb_dim=embedding_dim // 3,
            use_additional_conditions=use_additional_conditions)
        self.silu = nn.SiLU()
        self.linear = nn.Linear(embedding_dim, 6 * embedding_dim)

    def forward(self, timestep, added_cond_kwargs=None, batch_size=None,
                hidden_dtype=None):
        added_cond_kwargs = added_cond_kwargs or {
            "resolution": None, "aspect_ratio": None}
        embedded_timestep = self.emb(timestep, **added_cond_kwargs,
                                     batch_size=batch_size,
                                     hidden_dtype=hidden_dtype)
        return self.linear(self.silu(embedded_timestep)), embedded_timestep


class PixArtAlphaTextProjection(nn.Module):
    def __init__(self, in_features, hidden_size, out_features=None):
        super().__init__()
        out_features = out_features or hidden_size
        self.linear_1 = nn.Linear(in_features, hidden_size)
        self.act_1 = nn.GELU(approximate="tanh")
        self.linear_2 = nn.Linear(hidden_size, out_features)

    def forward(self, caption):
        return self.linear_2(self.act_1(self.linear_1(caption)))


# ---- ConfigMixin / ModelMixin plumbing -------------------------------
class _Config(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


class ConfigMixin:
    def register_to_config(self, **kwargs):
        self._internal_dict = _Config(kwargs)

    @property
    def config(self):
        return self._internal_dict


def register_to_config(init):
    import functools
    import inspect

    @functools.wraps(init)
    def wrapper(self, *args, **kwargs):
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
        self.register_to_config(**cfg)
        init(self, *args, **kwargs)

    return wrapper


class ModelMixin(nn.Module):
    pass


def _stub(name, **attrs):
    m = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


class _Dummy:
    def __init__(self, *a, **k):
        raise NotImplementedError("unused diffusers branch in the golden")


class _Logger:
    def warning(self, *a, **k):
        pass
    info = warning


import dataclasses  # noqa: E402


@dataclasses.dataclass
class Transformer2DModelOutput:
    sample: torch.Tensor


_stub("diffusers")
_stub("diffusers.configuration_utils", ConfigMixin=ConfigMixin,
      register_to_config=register_to_config)
_stub("diffusers.utils", logging=_stub("diffusers.utils.logging",
                                       get_logger=lambda n: _Logger()),
      deprecate=lambda *a, **k: None)
_stub("diffusers.utils.import_utils",
      is_torch_version=lambda op, v: False,
      is_torch_npu_available=lambda: False)
_stub("diffusers.models")
_stub("diffusers.models.attention_processor", Attention=_Dummy,
      AttentionProcessor=object, AttnProcessor=_Dummy,
      FusedAttnProcessor2_0=_Dummy)
_stub("diffusers.models.embeddings", PatchEmbed=PatchEmbed,
      PixArtAlphaTextProjection=PixArtAlphaTextProjection,
      SinusoidalPositionalEmbedding=_Dummy)
_stub("diffusers.models.modeling_outputs",
      Transformer2DModelOutput=Transformer2DModelOutput)
_stub("diffusers.models.modeling_utils", ModelMixin=ModelMixin)
_stub("diffusers.models.normalization", AdaLayerNormSingle=AdaLayerNormSingle,
      AdaLayerNorm=_Dummy, AdaLayerNormContinuous=_Dummy,
      AdaLayerNormZero=_Dummy)
_stub("diffusers.models.attention",
      _chunked_feed_forward=None, GatedSelfAttentionDense=_Dummy)
_stub("diffusers.models.activations", LinearActivation=_Dummy,
      ApproximateGELU=_Dummy, SwiGLU=_Dummy)

# true_ex ("exponent_based_sign_leading_ones") only exists in the
# examples/deit copy of the predictor — delegate like gm does for ex_pred
def _true_ex_delegate(self):
    return gm.pred_deit.exponent_approximation(
        self.Q, self.K, self.mx_specs).exponent_based_sign_leading_ones()


gm._FixedExponentApproximation.exponent_based_sign_leading_ones = \
    _true_ex_delegate

# funcs extras used by the PixArt modules
_funcs = sys.modules["funcs"]
for extra in ("create_file", "init_analysis_files", "save_idx_file",
              "save_diff_score_file", "diff_idx_analysis",
              "total_chosen_k"):
    if not hasattr(_funcs, extra):
        setattr(_funcs, extra, lambda *a, **k: 0.0)
_stub("funcs.analysis", create_file=lambda *a, **k: None,
      init_analysis_files=lambda *a, **k: None)

# the reference loads `.MX_transformer_block` relative to a package; load
# both modules under a synthetic package name
_pkg = types.ModuleType("ref_pixart_models")
_pkg.__path__ = []
sys.modules["ref_pixart_models"] = _pkg
ref_block = gm._load_module(
    os.path.join(REF, "workloads/PixArt/models/MX_transformer_block.py"),
    "ref_pixart_models.MX_transformer_block")
_pkg.MX_transformer_block = ref_block
ref_tr = gm._load_module(
    os.path.join(REF, "workloads/PixArt/models/MX_pixart_transformer_2d.py"),
    "ref_pixart_models.MX_pixart_transformer_2d")

# the PixArt-alpha operating point (text_local_inference_alpha.py:108-124):
# bfloat=32 + mx_flush_fp32_subnorms=True
PIXART_SPECS = gm.ref_finalize({
    "w_elem_format": "int8", "a_elem_format": "int8", "scale_bits": 8,
    "shared_exp_method": "max", "block_size": 32, "bfloat": 32, "fp": 0,
    "bfloat_subnorms": True, "round": "nearest",
    "round_mx_output": "nearest", "round_output": "nearest",
    "round_weight": "nearest", "mx_flush_fp32_subnorms": True,
    "custom_cuda": False, "quantize_backprop": False,
})

MODEL_KW = dict(num_attention_heads=2, attention_head_dim=72,
                in_channels=4, out_channels=8, num_layers=2,
                cross_attention_dim=144, sample_size=8, patch_size=2,
                caption_channels=32, num_embeds_ada_norm=1000)


def build(mx_quant=True, self_top_k=True, self_k=6, cross_top_k=True,
          cross_k=3, ex_pred=True, pred_mode="ex_pred",
          exclude_blocks=(1,), exclude_blocks_type="ex_pred",
          exclude_timesteps=()):
    torch.manual_seed(0)
    m = ref_tr.MXPixArtTransformer2DModel(**MODEL_KW)
    m.set_config(mx_quant=mx_quant, mx_specs=PIXART_SPECS if mx_quant
                 else None, self_top_k=self_top_k, self_k=self_k,
                 cross_top_k=cross_top_k, cross_k=cross_k, ex_pred=ex_pred,
                 pred_mode=pred_mode,
                 exclude_timesteps=list(exclude_timesteps),
                 exclude_blocks=list(exclude_blocks),
                 exclude_blocks_type=exclude_blocks_type)
    g = torch.Generator().manual_seed(44)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(0.1 * torch.randn(p.shape, generator=g))
    m.eval()
    return m


def main():
    rng = np.random.RandomState(9)
    B, S_TXT = 2, 5
    x = torch.tensor(rng.randn(B, 4, 8, 8).astype(np.float32))
    ctx = torch.tensor(rng.randn(B, S_TXT, 32).astype(np.float32))
    t = torch.tensor(np.array([999.0, 500.0], np.float32))
    # ragged text mask: 3 and 5 valid tokens (1 = keep)
    mask = torch.tensor(np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]],
                                 np.float32))
    save = {"x": x.numpy(), "ctx": ctx.numpy(), "t": t.numpy(),
            "mask": mask.numpy()}

    def fwd(m, case=None):
        """Forward; when ``case`` is set, also capture per-block inputs and
        outputs plus the adaLN t6 vector and the projected caption states.

        Rationale: MX quantization AMPLIFIES framework-level transcendental
        ulp deltas (a 3e-5 GELU-tanh delta near an MX rounding boundary
        flips a full grid step, ~2^-6), so an end-to-end bulk-closeness
        check degrades with depth.  The strong pin is per-block: replay
        each block with the TORCH-computed input, where our implementation
        must match to quantizer exactness."""
        hooks = []
        if case is not None:
            def cap_in_out(i):
                def pre(mod, args, kwargs):
                    save[f"{case}_b{i}_in"] = args[0].detach().numpy()
                def post(mod, inp, out):
                    save[f"{case}_b{i}_out"] = out.detach().numpy()
                return pre, post

            for i, blk in enumerate(m.transformer_blocks):
                pre, post = cap_in_out(i)
                hooks.append(blk.register_forward_pre_hook(
                    pre, with_kwargs=True))
                hooks.append(blk.register_forward_hook(post))

            def cap_ada(mod, inp, out):
                save[f"{case}_t6"] = out[0].detach().numpy()
            hooks.append(m.adaln_single.register_forward_hook(cap_ada))

            def cap_ctx(mod, inp, out):
                save["ctx_proj"] = out.detach().numpy()
            hooks.append(m.caption_projection.register_forward_hook(cap_ctx))
        try:
            return m(x, encoder_hidden_states=ctx, timestep=t,
                     encoder_attention_mask=mask,
                     return_dict=False)[0].numpy()
        finally:
            for h in hooks:
                h.remove()

    torch.topk = gm._stable_topk
    modes = ["ex_pred", "two_step_leading_ones", "MXINT4", "partial_Q",
             "partial_K", "true_ex"]
    with torch.no_grad():
        for mode in modes:
            m = build(pred_mode=mode)
            save[f"out_{mode}"] = fwd(m, case=mode)
            print(mode, float(np.abs(save[f"out_{mode}"]).mean()))
        # true-score top-k (ex_pred off, top_k on)
        m = build(ex_pred=False)
        save["out_true_topk"] = fwd(m, case="true_topk")
        # dense MX (no top-k anywhere)
        m = build(self_top_k=False, cross_top_k=False, ex_pred=False)
        save["out_dense"] = fwd(m, case="dense")
        # ELSA (set_config builds the d=72 matrix itself,
        # MX_pixart_transformer_2d.py:203-205; self-attention only — the
        # cross-attention forward has no ELSA branch, so cross runs its
        # topk on the predictor=ex_pred? NO: pred_mode cascades to cross
        # too, whose forward lacks an ELSA elif — it falls through with
        # pred_scores UNDEFINED unless ex_pred path... guard: run ELSA
        # with cross_top_k False to stay on the reference's working path
        torch.manual_seed(3)  # set_config's gram-schmidt draws
        m = build(pred_mode="ELSA", cross_top_k=False)
        save["out_ELSA"] = fwd(m, case="ELSA")
        save["elsa_matrix"] = np.stack(
            [b.attn1.orthogonal_matrix.numpy()
             for b in m.transformer_blocks])[0]
        print("ELSA", float(np.abs(save["out_ELSA"]).mean()))
        # the asymmetric exclude_timesteps gate: every timestep excluded —
        # self attention runs DENSE, cross falls back to TRUE-SCORE top-k
        # (MX_transformer_block.py:659 vs :817)
        m = build(exclude_timesteps=(0,))
        save["out_excluded_timestep"] = fwd(m, case="excluded_timestep")
        # unquantized fp32 (set_config never called with mx_quant)
        m = build(mx_quant=False, self_top_k=False, cross_top_k=False,
                  ex_pred=False)
        save["out_fp"] = fwd(m)
        torch.save(m.state_dict(),
                   os.path.join(OUT_DIR, "pixart_model_sd.pt"))

    np.savez_compressed(os.path.join(OUT_DIR, "pixart_model.npz"), **save)
    print("wrote pixart_model.npz + pixart_model_sd.pt")


if __name__ == "__main__":
    main()
