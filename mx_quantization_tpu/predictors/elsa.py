"""ELSA sign-projection hashing predictor.

Re-implements /root/reference/funcs/elsa_approximation.py:5-146 in JAX:
  * Kronecker-structured orthogonal projection (4x4x4 for d=64, 8 (x) 9 for
    d=72), small factors built by modified Gram-Schmidt over N(0,1) draws.
  * k-bit sign hashes of MX-quantized Q and K.
  * Approximate similarity = ||k|| * cos(pi/k * hamming - theta_bias).

The hamming distance is computed as a +-1 matmul (bf16, MXU-friendly) just
like the reference's einsum.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.elemwise import quantize_elemwise_op
from ..ops.mx import quantize_mx_op
from ..specs import MxSpecs

THETA_BIAS = 0.127  # paper calibration for d=64, k=64 (elsa_approximation.py:100)


def modified_gram_schmidt(dim: int, rng: np.random.RandomState) -> np.ndarray:
    """Random orthogonal basis via modified Gram-Schmidt (host-side, one-time)."""
    v = rng.randn(dim, dim).astype(np.float64)
    basis = np.zeros_like(v)
    for i in range(dim):
        u = v[i]
        for j in range(i):
            u = u - np.dot(basis[j], u) * basis[j]
        n = np.linalg.norm(u)
        if n < 1e-10:
            raise RuntimeError("Vectors are not linearly independent.")
        basis[i] = u / n
    return basis.astype(np.float32)


def create_structured_orthogonal_matrix(dim: int, seed: int = 0) -> np.ndarray:
    """k x d orthogonal projection via Kronecker products of small bases."""
    rng = np.random.RandomState(seed)
    if dim == 64:
        a1 = modified_gram_schmidt(4, rng)
        a2 = modified_gram_schmidt(4, rng)
        a3 = modified_gram_schmidt(4, rng)
        return np.kron(np.kron(a1, a2), a3)
    if dim == 72:
        a1 = modified_gram_schmidt(8, rng)
        a2 = modified_gram_schmidt(9, rng)
        return np.kron(a1, a2)
    raise ValueError(
        f"No structured matrix construction defined for d={dim}; add a "
        "factorization in create_structured_orthogonal_matrix.")


class ElsaApproximation:
    def __init__(self, Q: jax.Array, K: jax.Array, mx_specs: MxSpecs,
                 orthogonal_matrix: Optional[jax.Array] = None):
        self.specs = mx_specs
        self.d = Q.shape[-1]
        self.k = K.shape[-1]

        def mxq(x):
            return quantize_mx_op(
                quantize_elemwise_op(x, mx_specs, round=mx_specs.round_output),
                mx_specs, elem_format=mx_specs.a_elem_format, axes=[-1],
                round=mx_specs.round_mx_output)

        self.MX_Q = mxq(Q)
        self.MX_K = mxq(K)
        if orthogonal_matrix is None:
            orthogonal_matrix = jnp.asarray(
                create_structured_orthogonal_matrix(self.d))
        self.projection_matrix = jnp.asarray(orthogonal_matrix)

    def compute_hashes(self, x: jax.Array) -> jax.Array:
        projected = jnp.matmul(x, self.projection_matrix.T,
                               precision=jax.lax.Precision.HIGHEST)
        return projected >= 0

    def approximation_scores(self) -> jax.Array:
        """(..., Nq, Nk) approximate similarities."""
        if self.MX_Q.shape[-2] != self.MX_K.shape[-2]:
            raise ValueError(
                "ELSA is square-self-attention-only: the reference applies "
                "the key norms at the QUERY index "
                "(elsa_approximation.py:139-141) and its cross-attention "
                "forward has no ELSA branch — use an exponent-family "
                f"pred_mode for cross attention (got Nq="
                f"{self.MX_Q.shape[-2]}, Nk={self.MX_K.shape[-2]})")
        qh = self.compute_hashes(self.MX_Q)
        kh = self.compute_hashes(self.MX_K)
        key_norms = jnp.linalg.norm(self.MX_K, axis=-1)

        s_q = (qh.astype(jnp.float32) * 2.0 - 1.0).astype(jnp.bfloat16)
        s_k = (kh.astype(jnp.float32) * 2.0 - 1.0).astype(jnp.bfloat16)
        dots = jnp.matmul(s_q, jnp.swapaxes(s_k, -1, -2),
                          preferred_element_type=jnp.float32)
        hamming = 0.5 * (self.k - dots)
        est_angles = (jnp.pi / self.k) * hamming
        corrected = jnp.clip(est_angles - THETA_BIAS, 0.0, None)
        # REFERENCE SEMANTICS (elsa_approximation.py:139-141): the key
        # norms are unsqueezed on the QUERY axis (`unsqueeze(-1)`), so each
        # score ROW is scaled by the norm at the row's own index — a
        # positive per-row constant, i.e. the selection effectively ranks
        # by cos(angle) alone.  The ELSA paper's formula weights per KEY
        # (`[..., None, :]`), which changes within-row ranking; the model
        # goldens (tests/test_deit_model_golden.py ELSA case) pin the
        # reference behavior.  Square self-attention only, like the
        # reference (the broadcast errors otherwise — ELSA never runs in
        # cross-attention there).
        return key_norms[..., :, None] * jnp.cos(corrected)


def elsa_scores(Q, K, mx_specs, orthogonal_matrix=None):
    return ElsaApproximation(Q, K, mx_specs,
                             orthogonal_matrix).approximation_scores()
