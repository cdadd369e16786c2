"""Small shared utilities."""

from gennet_tpu.utils.summary import model_summary, param_count

__all__ = ["model_summary", "param_count"]
