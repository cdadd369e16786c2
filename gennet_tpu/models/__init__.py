"""Flax model families — the L4 layer of the reference, rebuilt TPU-first.

Factories mirror the reference's builder names (generator_model,
signal_discriminator_model, signal_pe_model, …; ref: bbhMahoGANy.py:164-539,
burstMahoGANy.py:100-423, ganymede.py:74-261, train_on_wvf_version/nn.py:72-106)
but produce Flax modules whose forward passes are pure functions — the GAN's
"frozen discriminator" composite (ref set_trainable, bbhMahoGANy.py:797-809)
becomes a stop_gradient/param-partition in the train step instead of model
surgery.
"""

from gennet_tpu.models.generator import BBHGenerator, BurstGenerator, DenseGenerator, TransposeGenerator
from gennet_tpu.models.discriminator import (
    PairDiscriminator,
    BurstDiscriminator,
    SoftmaxDiscriminator,
)
from gennet_tpu.models.cnn_pe import DualBranchPE, CombinedPE, BurstPE, MCDropoutPE

__all__ = [
    "BBHGenerator",
    "BurstGenerator",
    "DenseGenerator",
    "TransposeGenerator",
    "PairDiscriminator",
    "BurstDiscriminator",
    "SoftmaxDiscriminator",
    "DualBranchPE",
    "CombinedPE",
    "BurstPE",
    "MCDropoutPE",
]
