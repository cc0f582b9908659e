"""Typed MX quantization config.

The reference stacks two config systems: an untyped ``MxSpecs(UserDict)`` with
~30 string keys plus dependent-key defaulting, and per-workload hardcoded dicts
(see /root/reference/microxscaling/mx/specs.py:61-326).  Here both collapse
into a single frozen dataclass.  Frozen + hashable means an ``MxSpecs`` can be
closed over or passed as a static argument to ``jax.jit`` — quantization
parameters are compile-time constants on TPU, which is exactly what XLA wants.

Knob names are kept identical to the reference for reproducibility.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Optional

from .formats import ElemFormat, FormatLike


def _canon_format(f: FormatLike) -> Optional[str]:
    """Canonicalize an elem format to its string name (or None)."""
    if f is None:
        return None
    if isinstance(f, ElemFormat):
        return f.name
    return ElemFormat.from_str(f).name  # validates


@dataclasses.dataclass(frozen=True)
class MxSpecs:
    """All quantization knobs.  Defaults = no quantization.

    Forward-pass knobs:
      scale_bits       : sign+magnitude bits of the per-block shared exponent
                         (0 means "default 8" at the quantization site)
      w_elem_format    : weight MX element format (int8/int4/fp8_e4m3/... or None)
      a_elem_format    : activation MX element format
      block_size       : elements sharing one exponent (0 = whole axis)
      shared_exp_method: "max" | "none"
      mx_flush_fp32_subnorms : flush blocks whose shared scale is subnormal
      bfloat / fp      : elementwise ("vector unit") format applied between ops;
                         bfloat=X means 1s+8e+(X-9)m, fp=X means 1s+5e+(X-6)m.
                         0 disables. Only one of the two may be nonzero.
      bfloat_subnorms  : elementwise format supports subnorms

    Backward-pass formats default to their forward counterparts via
    ``finalize()``; ``quantize_backprop=False`` disables quantization of the
    backward pass entirely.

    Rounding-mode knobs mirror the reference's 12 per-site modes; each defaults
    to ``round`` when left None in ``finalize()``.
    """

    scale_bits: int = 0

    w_elem_format: Optional[str] = None
    a_elem_format: Optional[str] = None
    w_elem_format_bp: Optional[str] = None
    a_elem_format_bp: Optional[str] = None
    a_elem_format_bp_ex: Optional[str] = None
    a_elem_format_bp_os: Optional[str] = None
    mx_flush_fp32_subnorms: bool = False

    shared_exp_method: str = "max"
    block_size: int = 0

    bfloat: int = 0
    fp: int = 0
    bfloat_subnorms: bool = True

    quantize_backprop: bool = True

    round: str = "nearest"
    round_m: Optional[str] = None
    round_weight: Optional[str] = None
    round_output: Optional[str] = None
    round_grad_weight: Optional[str] = None
    round_grad_input: Optional[str] = None
    round_mx_output: Optional[str] = None
    round_mx_input_grad_input: Optional[str] = None
    round_mx_weight_grad_input: Optional[str] = None
    round_mx_grad_output_grad_input: Optional[str] = None
    round_mx_input_grad_weight: Optional[str] = None
    round_mx_grad_output_grad_weight: Optional[str] = None

    softmax_exp2: bool = False
    vec_use_exp2: bool = False
    vec_use_recip: bool = False

    # TPU execution knobs (new; no reference equivalent).
    #   "ref"    : pure-jnp emulation, bit-faithful to the reference semantics
    #   "fused"  : Pallas kernels with quantization fused into the matmul
    custom_tpu: str = "ref"
    # Weights already sit on the MX grid (reference Linear.prequantize_weights,
    # linear.py:276-304): the forward pass skips weight quantization.
    prequantized_weights: bool = False
    # Activations already sit on the MX grid along axis -1 (a producer-side
    # fused kernel quantized them, e.g. ln_modulate_quantize_pallas): the
    # fast-path linear skips its input quantization.  Only meaningful with
    # custom_tpu="fused" and bfloat=0.
    prequantized_activations: bool = False

    def __post_init__(self):
        for f in ("w_elem_format", "a_elem_format", "w_elem_format_bp",
                  "a_elem_format_bp", "a_elem_format_bp_ex", "a_elem_format_bp_os"):
            object.__setattr__(self, f, _canon_format(getattr(self, f)))
        if self.bfloat and self.fp:
            raise ValueError("Cannot set both bfloat and fp in MxSpecs")
        if 0 < self.bfloat <= 9:
            raise ValueError("bfloat must be 0 or > 9")
        if 0 < self.fp <= 6:
            raise ValueError("fp must be 0 or > 6")
        if self.shared_exp_method not in ("max", "none"):
            raise ValueError(f"Unknown shared_exp_method {self.shared_exp_method}")

    # ------------------------------------------------------------------
    def finalize(self) -> "MxSpecs":
        """Resolve dependent defaults (bp formats <- fwd, round_* <- round)."""
        upd = {}

        def dflt(field, src):
            if getattr(self, field) is None:
                upd[field] = upd.get(src, getattr(self, src))

        dflt("w_elem_format_bp", "w_elem_format")
        dflt("a_elem_format_bp", "a_elem_format")
        dflt("a_elem_format_bp_os", "a_elem_format")
        dflt("a_elem_format_bp_ex", "a_elem_format")

        for f in ("round_m", "round_output", "round_grad_weight",
                  "round_grad_input", "round_weight", "round_mx_output"):
            dflt(f, "round")

        base_gi = self.round_grad_input if self.round_grad_input is not None \
            else self.round
        for f in ("round_mx_input_grad_input", "round_mx_weight_grad_input",
                  "round_mx_grad_output_grad_input", "round_mx_input_grad_weight",
                  "round_mx_grad_output_grad_weight"):
            if getattr(self, f) is None:
                upd[f] = base_gi

        return dataclasses.replace(self, **upd) if upd else self

    def backwards(self) -> "MxSpecs":
        """Specs to use on the backward pass.

        When quantize_backprop is False this strips all quantization, matching
        the reference's get_backwards_mx_specs (specs.py:193-209).
        """
        if self.quantize_backprop:
            return self
        return dataclasses.replace(
            self,
            w_elem_format=None, a_elem_format=None,
            w_elem_format_bp=None, a_elem_format_bp=None,
            a_elem_format_bp_os=None, a_elem_format_bp_ex=None,
            block_size=0, bfloat=0, fp=0,
        )

    # ------------------------------------------------------------------
    @property
    def is_noop(self) -> bool:
        """True if these specs perform no quantization anywhere."""
        return not any((
            self.w_elem_format, self.a_elem_format, self.w_elem_format_bp,
            self.a_elem_format_bp, self.a_elem_format_bp_os,
            self.a_elem_format_bp_ex, self.bfloat, self.fp,
        ))

    def effective_scale_bits(self) -> int:
        return 8 if self.scale_bits == 0 else self.scale_bits

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def json(self, indent=None) -> str:
        return json.dumps(self.to_dict(), indent=indent)

    def replace(self, **kw) -> "MxSpecs":
        return dataclasses.replace(self, **kw)

    @classmethod
    def from_dict(cls, d: dict, finalize: bool = True) -> Optional["MxSpecs"]:
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(d) - known
        if unknown:
            raise KeyError(f"Unknown MxSpecs keys: {sorted(unknown)}")
        s = cls(**d)
        return s.finalize() if finalize else s


def finalize_mx_specs(specs, early_exit: bool = True) -> Optional[MxSpecs]:
    """dict/MxSpecs -> finalized MxSpecs, or None if nothing is quantized.

    Mirrors the reference's early-exit contract (specs.py:279-326): returning
    None means "run the unquantized op".
    """
    if specs is None:
        return None
    if isinstance(specs, dict):
        specs = MxSpecs.from_dict(specs, finalize=False)
    if early_exit and specs.is_noop:
        return None
    return specs.finalize()


# ----------------------------------------------------------------------
# argparse wiring (parity with add_mx_args / get_mx_specs)
# ----------------------------------------------------------------------
def add_mx_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    group = parser.add_argument_group("mx", "MX quantization specs")
    for f in dataclasses.fields(MxSpecs):
        name, default = f.name, f.default
        if "elem_format" in name or name in ("shared_exp_method", "custom_tpu"):
            group.add_argument(f"--{name}", type=str, default=None)
        elif isinstance(default, bool) and default is False:
            group.add_argument(f"--{name}", action="store_true", default=None)
        elif isinstance(default, bool) and default is True:
            group.add_argument(f"--no_{name}", action="store_true", default=None)
        elif isinstance(default, int):
            group.add_argument(f"--{name}", type=int, default=None)
        else:
            group.add_argument(f"--{name}", type=str, default=None)
    group.add_argument("--skip_early_exit", action="store_true", default=False)
    return parser


def get_mx_specs(args: argparse.Namespace) -> Optional[MxSpecs]:
    d = {}
    for f in dataclasses.fields(MxSpecs):
        if isinstance(f.default, bool) and f.default is True:
            v = getattr(args, f"no_{f.name}", None)
            if v:
                d[f.name] = False
        else:
            v = getattr(args, f.name, None)
            if v is not None:
                d[f.name] = v
    early_exit = not getattr(args, "skip_early_exit", False)
    return finalize_mx_specs(d or None, early_exit=early_exit)


# ----------------------------------------------------------------------
# MX_ASSERT: env-gated guard against silently-unquantized ops
# ----------------------------------------------------------------------
_ASSERT_MODE = os.environ.get("MX_ASSERT", "False")


def mx_assert_test(mx_specs) -> None:
    """Raise if MX_ASSERT=True and an MX op is called with specs=None
    (reference specs.py:351-363 — catches paths that silently fall back to
    the unquantized op during quantization experiments)."""
    if _ASSERT_MODE == "True" and mx_specs is None:
        import traceback
        stack = traceback.extract_stack()
        f1 = stack[-2]
        f2 = stack[-3]
        raise ValueError(
            "MX assert test failed!\n"
            f"mx_specs is None in function {f1.name}\n"
            f"Called from {f2.filename}, line {f2.lineno}\n"
            f"  {f2.line}")
