"""Quantized LSTM built from the MX linear + vector ops.

Reference: microxscaling/mx/rnn.py:70-362 — an LSTM cell whose gate
projections run through the MX linear and whose activations/elementwise
updates run through the quantized vector chain.  TPU-native: the time loop
is a lax.scan.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .activations import mx_sigmoid, mx_tanh, sigmoid, tanh
from .linear import linear
from .vector import vec_add, vec_mul


class LSTMParams(NamedTuple):
    w_ih: jax.Array  # (4H, I)
    w_hh: jax.Array  # (4H, H)
    b_ih: Optional[jax.Array]
    b_hh: Optional[jax.Array]


def init_lstm(key, input_size: int, hidden_size: int,
              bias: bool = True) -> LSTMParams:
    import math
    k = 1.0 / math.sqrt(hidden_size)
    ks = jax.random.split(key, 4)
    u = lambda kk, shape: jax.random.uniform(kk, shape, jnp.float32, -k, k)
    return LSTMParams(
        u(ks[0], (4 * hidden_size, input_size)),
        u(ks[1], (4 * hidden_size, hidden_size)),
        u(ks[2], (4 * hidden_size,)) if bias else None,
        u(ks[3], (4 * hidden_size,)) if bias else None,
    )


def lstm(x: jax.Array, params: LSTMParams,
         h0: Optional[jax.Array] = None, c0: Optional[jax.Array] = None,
         mx_specs=None) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """x: (T, B, I) -> (outputs (T, B, H), (h_T, c_T)).

    Gate order i, f, g, o (torch convention).
    """
    T, B, _ = x.shape
    H = params.w_hh.shape[1]
    h = jnp.zeros((B, H)) if h0 is None else h0
    c = jnp.zeros((B, H)) if c0 is None else c0

    sig = (lambda v: sigmoid(v, mx_specs))
    th = (lambda v: tanh(v, mx_specs))

    def cell(carry, xt):
        h, c = carry
        gates = (linear(xt, params.w_ih, params.b_ih, mx_specs=mx_specs) +
                 linear(h, params.w_hh, params.b_hh, mx_specs=mx_specs))
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = sig(i), sig(f), sig(o)
        g = th(g)
        c = vec_add(vec_mul(f, c, mx_specs), vec_mul(i, g, mx_specs),
                    mx_specs)
        h = vec_mul(o, th(c), mx_specs)
        return (h, c), h

    (h, c), ys = jax.lax.scan(cell, (h, c), x)
    return ys, (h, c)


class LSTMStackParams(NamedTuple):
    """Per layer: (forward LSTMParams, backward LSTMParams or None)."""
    layers: Tuple[Tuple[LSTMParams, Optional[LSTMParams]], ...]


def init_lstm_stack(key, input_size: int, hidden_size: int,
                    num_layers: int = 1, bias: bool = True,
                    bidirectional: bool = False) -> LSTMStackParams:
    """Multi-layer (optionally bidirectional) LSTM init — the reference
    LSTM module's full configuration space (rnn.py:18-67): layer n > 0
    consumes D*hidden_size features."""
    D = 2 if bidirectional else 1
    layers = []
    for n in range(num_layers):
        in_f = input_size if n == 0 else D * hidden_size
        key, kf, kb = jax.random.split(key, 3)
        fwd = init_lstm(kf, in_f, hidden_size, bias)
        bwd = init_lstm(kb, in_f, hidden_size, bias) if bidirectional \
            else None
        layers.append((fwd, bwd))
    return LSTMStackParams(tuple(layers))


def lstm_stack(x: jax.Array, params: LSTMStackParams, mx_specs=None
               ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """x: (T, B, I) -> (outputs (T, B, D*H), (h_n, c_n) each
    (D*num_layers, B, H)) — torch nn.LSTM layout/order (layer-major,
    directions adjacent, rnn.py:58-67)."""
    hs, cs = [], []
    for fwd, bwd in params.layers:
        yf, (hf, cf) = lstm(x, fwd, mx_specs=mx_specs)
        hs.append(hf); cs.append(cf)
        if bwd is not None:
            yb, (hb, cb) = lstm(jnp.flip(x, axis=0), bwd, mx_specs=mx_specs)
            hs.append(hb); cs.append(cb)
            x = jnp.concatenate([yf, jnp.flip(yb, axis=0)], axis=-1)
        else:
            x = yf
    return x, (jnp.stack(hs), jnp.stack(cs))
