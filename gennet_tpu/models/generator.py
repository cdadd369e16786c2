"""Generator networks: latent vector → noise-free waveform estimate."""

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from gennet_tpu.models.layers import (GaussianDropout, activation,
                                      conv1d_layer, upsample1d)


class BBHGenerator(nn.Module):
    """The flagship 1-D convolutional generator
    (ref: generator_model, bbhMahoGANy.py:212-295).

    latent(100) → Dense(256·n/2) → BN → tanh → Dropout(0.2) → reshape(n/2,256)
    → [Up2 → Conv(64,5,s2) → BN/tanh/Drop]     (length n/2)
    → [Up2 → Conv(128,5)    → BN/tanh/Drop]    (length n)
    → [Conv(256,5) → Conv(512,5) → Conv(1024,5), BN/tanh/Drop each]
    → Conv(1,5) linear → (n, 1)

    BatchNorm momentum 0.99 as the reference sets (ref: :223); channel counts
    are MXU-friendly multiples of 64.
    """

    n_out: int = 1024
    latent_dim: int = 100
    filt: int = 5
    act: str = "tanh"
    drate: float = 0.2
    bn_momentum: float = 0.99
    features: Sequence[int] = (64, 128, 256, 512, 1024)
    dtype: jnp.dtype = jnp.float32      # compute dtype; bfloat16 puts the
                                        # convs on the MXU fast path (params
                                        # stay float32)
    conv_impl: str = "xla"              # 'xla' (nn.Conv) or 'pallas'
                                        # (PallasConv1D MXU kernel); param
                                        # trees are identical either way
    norm: str = "batch"                 # 'batch' (reference, ref :223),
                                        # 'group', or 'none'. BatchNorm is the
                                        # measured source of the generator's
                                        # train/eval mode gap (r2 calibration:
                                        # eval-mode draws +8.8σ biased because
                                        # running stats lag the adversarial
                                        # oscillation); 'group'/'none' are
                                        # batch-independent so train and eval
                                        # outputs agree modulo dropout.
                                        # Param trees DIFFER — new runs only.

    def _norm(self, x, bn: bool):
        if self.norm == "batch":
            return nn.BatchNorm(use_running_average=not bn,
                                momentum=self.bn_momentum, dtype=self.dtype)(x)
        if self.norm == "group":
            return nn.GroupNorm(num_groups=None, group_size=16, dtype=self.dtype)(x)
        return x

    @nn.compact
    def __call__(self, z, train: bool = False, bn_train: bool | None = None):
        # bn_train decouples the BN statistics mode from dropout: the
        # posterior sampler can draw with batch-statistics BN (the mode the
        # generator was actually optimized in) but dropout OFF — the
        # measured fix for the +8.8σ eval-mode bias without MC-dropout's
        # 3.1× over-dispersion (scripts/bbh_sampler_calibration.py).
        bn = train if bn_train is None else bn_train
        act = activation(self.act)
        half = self.n_out // 2

        x = nn.Dense(256 * half, dtype=self.dtype)(z)
        x = self._norm(x, bn)
        x = act(x)
        x = nn.Dropout(self.drate, deterministic=not train)(x)
        x = x.reshape((x.shape[0], half, 256))

        for i, feat in enumerate(self.features):
            if i <= 1:
                x = upsample1d(x, 2)
            x = conv1d_layer(self.conv_impl, feat, self.filt,
                             strides=2 if i == 0 else 1,
                             dtype=self.dtype, name=f"Conv_{i}")(x)
            x = self._norm(x, bn)
            x = act(x)
            x = nn.Dropout(self.drate, deterministic=not train)(x)

        # final 1-channel projection stays on nn.Conv: Cout=1 pads to a full
        # 128-lane tile in the Pallas kernel — pure waste for this layer
        x = nn.Conv(1, (self.filt,), padding="SAME", dtype=jnp.float32,
                    name=f"Conv_{len(self.features)}")(x)
        return x  # (B, n_out, 1), linear float32 output


class BurstGenerator(nn.Module):
    """Smoke-workload generator (ref: burstMahoGANy.py:127-251):
    Dense(256·n/2) relu → reshape → Up2 → Conv(64,5) → GaussianDropout(0.3)
    → Conv(64,5) → Conv(256,5) → Conv(512,5) (same) → Conv(1,5) tanh."""

    n_out: int = 512
    latent_dim: int = 100
    drate: float = 0.3
    features: Sequence[int] = (64, 64, 256, 512)

    @nn.compact
    def __call__(self, z, train: bool = False):
        half = self.n_out // 2
        x = nn.Dense(256 * half)(z)
        x = nn.relu(x)
        x = x.reshape((x.shape[0], half, 256))
        x = upsample1d(x, 2)
        for feat in self.features:
            x = nn.Conv(feat, (5,), strides=(1,), padding="SAME")(x)
            x = nn.relu(x)
            x = GaussianDropout(self.drate)(x, deterministic=not train)
        x = nn.Conv(1, (5,), padding="SAME")(x)
        return jnp.tanh(x)


class DenseGenerator(nn.Module):
    """Gen-3 softmax-GAN generator (ref: train_on_wvf_version/nn.py:72-81):
    Dense(300) relu → Dense(150) relu → Dense(n_out) tanh."""

    n_out: int = 512
    latent_dim: int = 10
    dense_dim: int = 300

    @nn.compact
    def __call__(self, z, train: bool = False):
        del train
        x = nn.relu(nn.Dense(self.dense_dim)(z))
        x = nn.relu(nn.Dense(150)(x))
        return jnp.tanh(nn.Dense(self.n_out)(x))


class TransposeGenerator(nn.Module):
    """Gen-4 anti-mode-collapse transpose-conv generator
    (ref: 2_model_version/*/no_mode_collapse_network.py; Conv2DTranspose
    512/256/128/64 stack over a 1-D series, latent dim 1)."""

    n_out: int = 512
    latent_dim: int = 1
    features: Sequence[int] = (512, 256, 128, 64)
    act: str = "relu"
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, z, train: bool = False):
        act = activation(self.act)
        x = nn.Dense(self.n_out)(z)
        x = x.reshape((x.shape[0], self.n_out, 1))
        for feat in self.features:
            x = nn.ConvTranspose(feat, (5,), strides=(1,), padding="SAME")(x)
            x = act(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum)(x)
        x = nn.ConvTranspose(1, (5,), padding="SAME")(x)
        return jnp.tanh(x)
