"""Element format definitions for MX (OCP Microscaling) quantization.

TPU-native re-design of the format-parameter table of the reference
implementation (see /root/reference/microxscaling/mx/formats.py:22-125 for the
behavior this reproduces).  Pure Python — no tensor library needed — so it can
be used from trace-time (static) code inside ``jax.jit``.

A format is described by:
  ebits    : exponent bits (0 for ints)
  mbits    : mantissa bits INCLUDING the sign bit and the implicit leading one
  emax     : maximum normal exponent
  max_norm : largest representable magnitude
  min_norm : smallest normal magnitude (0 for ints)

Conventions (identical to the OCP MX spec emulation in the reference):
  * ``intX`` is a sign-magnitude fixed point grid with a "1.xxx" radix, i.e.
    representable points are i / 2**(X-2) for |i| <= 2**(X-1)-1.  Note this
    means max_norm for int8 is 127/64 (there is no representable 2.0).
  * ``fp8_e4m3`` has no Inf and uses the top exponent for large normals,
    giving max_norm = 2**emax * 1.75.
  * ``bfloatX`` is 1 sign + 8 exponent + (X-9) mantissa bits.
  * ``fpX`` (X>6) is 1 sign + 5 exponent + (X-6) mantissa bits.
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Optional, Union

FP32_EXPONENT_BIAS = 127
FP32_MIN_NORMAL = 2.0 ** (-FP32_EXPONENT_BIAS + 1)


class RoundingMode(enum.IntEnum):
    """Mantissa rounding modes.

    nearest : round half away from zero
    floor   : truncate toward zero
    even    : round half to even (RNE)
    """

    nearest = 0
    floor = 1
    even = 2

    @staticmethod
    def string_enums():
        return [m.name for m in RoundingMode]


class ElemFormat(enum.Enum):
    int8 = 1
    int4 = 2
    int2 = 3
    fp8_e5m2 = 4
    fp8_e4m3 = 5
    fp6_e3m2 = 6
    fp6_e2m3 = 7
    fp4 = 8
    fp4_e2m1 = 8
    float16 = 9
    fp16 = 9
    bfloat16 = 10
    bf16 = 10

    @staticmethod
    def from_str(s: str) -> "ElemFormat":
        assert s is not None, "elem_format string is None"
        s = s.lower()
        if hasattr(ElemFormat, s):
            return getattr(ElemFormat, s)
        raise ValueError(f"Undefined elem format: {s!r}")


FormatLike = Union[str, ElemFormat, None]


class FormatParams(NamedTuple):
    ebits: int
    mbits: int
    emax: int
    max_norm: float
    min_norm: float


def _min_norm(ebits: int) -> float:
    """Smallest normal for a float format; 0 for ints (ebits == 0)."""
    if ebits == 0:
        return 0.0
    emin = 2 - (2 ** (ebits - 1))
    return 2.0 ** emin


def _max_norm(ebits: int, mbits: int) -> float:
    """Largest normal for float formats that reserve top exponent for NaN/Inf."""
    assert ebits >= 5, "only valid for formats that define NaN/Inf"
    emax = 0 if ebits == 0 else 2 ** (ebits - 1) - 1
    return 2 ** emax * float(2 ** (mbits - 1) - 1) / 2 ** (mbits - 2)


# (ebits, mbits, emax) per format; max_norm/min_norm derived below.
_FORMAT_TABLE = {
    ElemFormat.int8: (0, 8, 0),
    ElemFormat.int4: (0, 4, 0),
    ElemFormat.int2: (0, 2, 0),
    ElemFormat.fp8_e5m2: (5, 4, 15),
    ElemFormat.fp8_e4m3: (4, 5, 8),
    ElemFormat.fp6_e3m2: (3, 4, 4),
    ElemFormat.fp6_e2m3: (2, 5, 2),
    ElemFormat.fp4: (2, 3, 2),
    ElemFormat.float16: (5, 12, 15),
    ElemFormat.bfloat16: (8, 9, 127),
}

_PARAM_CACHE: dict = {}


def format_params(fmt: FormatLike) -> FormatParams:
    """Return (ebits, mbits, emax, max_norm, min_norm) for a format."""
    if isinstance(fmt, str):
        fmt = ElemFormat.from_str(fmt)
    if fmt in _PARAM_CACHE:
        return _PARAM_CACHE[fmt]
    if fmt not in _FORMAT_TABLE:
        raise ValueError(f"Unknown element format {fmt}")
    ebits, mbits, emax = _FORMAT_TABLE[fmt]
    if fmt is ElemFormat.fp8_e4m3:
        # e4m3 has no Inf; extended max normal.
        max_norm = 2 ** emax * 1.75
    else:
        max_norm = 2 ** emax * float(2 ** (mbits - 1) - 1) / 2 ** (mbits - 2)
    params = FormatParams(ebits, mbits, emax, max_norm, _min_norm(ebits))
    _PARAM_CACHE[fmt] = params
    return params
