"""Discriminator networks."""

from typing import Sequence

from flax import linen as nn

from gennet_tpu.models.layers import activation, conv1d_layer


class PairDiscriminator(nn.Module):
    """The flagship two-channel discriminator over (waveform, residual)
    pairs (ref: signal_discriminator_model, bbhMahoGANy.py:408-498).

    The reference fed a (n_pix, 2, 1) "image" to Conv2D(5,5)/stride(2,1)
    layers; on TPU the natural formulation is a 1-D convolution over time
    with the pair as 2 input channels — same receptive structure over the
    (waveform, residual) stack, MXU-friendly layout, no degenerate width-2
    spatial axis. Feature widths ×4 scale as the reference's
    n_neuron_scale=4 (ref: :430): Conv(256,5,s2) → Conv(512,5,s2), LeakyReLU
    0.2, Dropout 0.4, Dense(1) sigmoid-logit.
    """

    features: Sequence[int] = (256, 512)
    filt: int = 5
    drate: float = 0.4
    alpha: float = 0.2
    dtype: "jnp.dtype" = None           # compute dtype (None → float32)
    conv_impl: str = "xla"              # 'xla' or 'pallas' (see layers)

    @nn.compact
    def __call__(self, pair, train: bool = False):
        # pair: (B, n_pix, 2) — channel 0 waveform, channel 1 residual/noise
        import jax.numpy as jnp

        dtype = self.dtype or jnp.float32
        x = pair
        for i, feat in enumerate(self.features):
            x = conv1d_layer(self.conv_impl, feat, self.filt, strides=2,
                             dtype=dtype, name=f"Conv_{i}")(x)
            x = nn.leaky_relu(x, negative_slope=self.alpha)
            x = nn.Dropout(self.drate, deterministic=not train)(x)
        x = x.reshape((x.shape[0], -1))
        return nn.Dense(1, dtype=jnp.float32)(x)  # float32 logits for stable BCE


class BurstDiscriminator(nn.Module):
    """Smoke-workload discriminator on raw 1-D series
    (ref: burstMahoGANy.py:295-402): Conv(64,5) tanh → maxpool2 →
    Conv(128,5) tanh → maxpool2 → flatten → Dense(1024) tanh → Dense(1)."""

    act: str = "tanh"

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        act = activation(self.act)
        x = nn.Conv(64, (5,), strides=(1,), padding="SAME")(x)
        x = act(x)
        x = nn.max_pool(x, (2,), strides=(2,))
        x = nn.Conv(128, (5,), strides=(1,), padding="VALID")(x)
        x = act(x)
        x = nn.max_pool(x, (2,), strides=(2,))
        x = x.reshape((x.shape[0], -1))
        x = act(nn.Dense(1024)(x))
        return nn.Dense(1)(x)  # logits


class SoftmaxDiscriminator(nn.Module):
    """Gen-3 two-class discriminator (ref: train_on_wvf_version/nn.py:83-93):
    Conv(25,5) relu → Dropout(.25) → flatten → Dense(25) → Dense(2)."""

    n_channels: int = 25
    conv_sz: int = 5
    drate: float = 0.25

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim == 2:
            x = x[..., None]
        x = nn.relu(nn.Conv(self.n_channels, (self.conv_sz,), padding="VALID")(x))
        x = nn.Dropout(self.drate, deterministic=not train)(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.n_channels)(x)
        return nn.Dense(2)(x)  # 2-class logits
