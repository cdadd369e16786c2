"""Evaluation: posterior overlap statistics, analytic grid posteriors, plots."""

from gennet_tpu.eval.overlap import beta_overlap, overlap_tests, gaussian_kde_pdf
from gennet_tpu.eval.grid_posterior import (
    burst_grid_posterior,
    grid_credible_interval,
    grid_overlap_score,
)

__all__ = [
    "beta_overlap",
    "overlap_tests",
    "gaussian_kde_pdf",
    "burst_grid_posterior",
    "grid_credible_interval",
    "grid_overlap_score",
]
