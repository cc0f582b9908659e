"""Approximated Q·K^T predictor family for top-k attention pruning."""

from .exponent import ExponentApproximation, exponent_predict
from .elsa import (
    ElsaApproximation,
    create_structured_orthogonal_matrix,
    modified_gram_schmidt,
)

PRED_MODES = (
    "ex_pred",
    "partial_Q",
    "partial_K",
    "two_step_leading_ones",
    "MXINT4",
    "true_ex",
    "threshold_ex",
    "ELSA",
)
