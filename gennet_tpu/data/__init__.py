"""Data pipelines: on-device template-bank synthesis and lalinference interop."""

from gennet_tpu.data.template_bank import (
    BankConfig,
    make_template_batch,
    make_event,
    make_bank,
    make_bank_sharded,
)

__all__ = [
    "BankConfig",
    "make_template_batch",
    "make_event",
    "make_bank",
    "make_bank_sharded",
]
