"""Ambient quantization context — the explicit-API replacement for the
reference's global monkey-patching (mx_mapping.inject_pyt_ops,
mx_mapping.py:41-57).

The reference rewrites torch.* dict entries so downstream code silently
quantizes.  Here the equivalent convenience is an ambient specs context: ops
called with ``mx_specs=None`` inside ``with quantized(specs):`` pick up the
context specs.  Explicit per-call specs always win; models in this repo pass
specs explicitly (the recommended style), so this exists for quick
experiments and for porting code written against the reference's implicit
style.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

from .specs import MxSpecs

_state = threading.local()


def current_specs() -> Optional[MxSpecs]:
    return getattr(_state, "specs", None)


@contextlib.contextmanager
def quantized(specs: MxSpecs):
    prev = current_specs()
    _state.specs = specs
    try:
        yield
    finally:
        _state.specs = prev


def resolve(mx_specs: Optional[MxSpecs]) -> Optional[MxSpecs]:
    """Per-call specs if given, else the ambient context specs."""
    return mx_specs if mx_specs is not None else current_specs()


def linear(x, w, b=None, mx_specs=None):
    from .ops.linear import linear as _linear
    return _linear(x, w, b, mx_specs=resolve(mx_specs))


def matmul(a, b, bias=None, mx_specs=None, mode_config="aa"):
    from .ops.linear import matmul as _matmul
    return _matmul(a, b, bias, mx_specs=resolve(mx_specs),
                   mode_config=mode_config)


def softmax(x, dim=-1, mx_specs=None):
    from .ops.softmax import softmax as _softmax
    return _softmax(x, dim, mx_specs=resolve(mx_specs))


def gelu(x, mx_specs=None, first_order_gelu=False):
    from .ops.activations import gelu as _gelu
    return _gelu(x, mx_specs=resolve(mx_specs),
                 first_order_gelu=first_order_gelu)
