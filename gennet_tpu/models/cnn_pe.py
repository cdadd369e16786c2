"""CNN parameter point-estimators: whitened series → (mc, q) estimates."""

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from gennet_tpu.models.layers import PermaDropout


class DualBranchPE(nn.Module):
    """The default flagship PE net (ref: signal_pe_model with
    comb_pe_model=False, bbhMahoGANy.py:356-404): independent conv branches
    per parameter.

    mc branch: Conv 64/128/256/512 (all stride 2, first SAME then VALID)
      → flatten → Dense(1) → relu
    q branch: Conv 64/128/256 (stride 1), 512/1024 (stride 2)
      → flatten → Dense(1) → relu clipped to 1.0 (q = m2/m1 ∈ (0, 1])
    Output: (B, 2) = [mc, q].
    """

    filt: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        # x: (B, n_pix, 1)
        mc = nn.relu(nn.Conv(64, (self.filt,), strides=(2,), padding="SAME")(x))
        for feat in (128, 256, 512):
            mc = nn.relu(nn.Conv(feat, (self.filt,), strides=(2,), padding="VALID")(mc))
        mc = mc.reshape((mc.shape[0], -1))
        mc = nn.relu(nn.Dense(1)(mc))

        q = nn.relu(nn.Conv(64, (self.filt,), strides=(1,), padding="SAME")(x))
        q = nn.relu(nn.Conv(128, (self.filt,), strides=(1,), padding="VALID")(q))
        q = nn.relu(nn.Conv(256, (self.filt,), strides=(1,), padding="VALID")(q))
        q = nn.relu(nn.Conv(512, (self.filt,), strides=(2,), padding="VALID")(q))
        q = nn.relu(nn.Conv(1024, (self.filt,), strides=(2,), padding="VALID")(q))
        q = q.reshape((q.shape[0], -1))
        # the reference caps the q head with ReLU(max_value=1.0) (ref :399) —
        # measured seed-fragile here: a 500k batch-8 run pinned the head at
        # the clip (gradient exactly 0 above 1) and the branch died with
        # mean-abs-err ≈ the prior width. A saturating-but-differentiable
        # head keeps the same (0, 1] range with a gradient everywhere:
        # q = sigmoid(z), pinned outputs recover instead of dying.
        # CHECKPOINT COMPATIBILITY: the param tree is identical to the old
        # ReLU-clip head, so pre-sigmoid (r1/early-r2) DualBranchPE
        # checkpoints restore WITHOUT error but yield mis-calibrated q
        # (logits trained to hit [0,1] directly get squashed again) —
        # retrain rather than reuse them.
        q = nn.sigmoid(nn.Dense(1)(q))

        return jnp.concatenate([mc, q], axis=-1)


class CombinedPE(nn.Module):
    """Single-net PE variant (ref: comb_pe_model=True branch,
    bbhMahoGANy.py:308-354): Conv 64/128/256/512 s2 + PReLU + BN →
    Dense(1024) → Dense(npar) relu."""

    npar: int = 2
    filt: int = 5
    bn_momentum: float = 0.9
    features: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, feat in enumerate(self.features):
            pad = "VALID"
            x = nn.Conv(feat, (self.filt,), strides=(2,), padding=pad)(x)
            x = nn.PReLU()(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum)(x)
            if i == 0:
                x = nn.Dropout(0.5, deterministic=not train)(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.PReLU()(nn.Dense(1024)(x))
        return nn.relu(nn.Dense(self.npar)(x))


class BurstPE(nn.Module):
    """Smoke-workload PE (ref: burstMahoGANy.py:263-293): Conv(64,5,s2) relu
    → Conv(128,5,s2) relu → flatten → Dense(1024) relu → Dense(2) linear."""

    npar: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        x = nn.relu(nn.Conv(64, (5,), strides=(2,), padding="SAME")(x))
        x = nn.relu(nn.Conv(128, (5,), strides=(2,), padding="VALID")(x))
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(1024)(x))
        return nn.Dense(self.npar)(x)


class MCDropoutPE(nn.Module):
    """Monte-Carlo-dropout PE: dropout stays active at inference so repeated
    forward passes draw an approximate posterior (ref: PermaDropout +
    signal_dropout_pe_model, ganymede.py:67-72,175-209). Call with a
    'dropout' rng each sample."""

    npar: int = 2
    rate: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.tanh(nn.Conv(64, (5,), strides=(1,), padding="SAME")(x))
        x = nn.max_pool(x, (2,), strides=(2,))
        x = PermaDropout(self.rate)(x)
        x = jnp.tanh(nn.Conv(128, (5,), strides=(1,), padding="VALID")(x))
        x = nn.max_pool(x, (2,), strides=(2,))
        x = x.reshape((x.shape[0], -1))
        x = PermaDropout(self.rate)(x)
        x = jnp.tanh(nn.Dense(1024)(x))
        x = PermaDropout(self.rate)(x)
        return nn.Dense(self.npar)(x)
