"""Training: fused jitted train steps, mesh/data-parallel wrappers,
checkpointing, and metrics."""

from gennet_tpu.train.mesh import data_mesh, distributed_init
from gennet_tpu.train.gan import GANConfig, GANState, init_gan, gan_step, make_gan_step
from gennet_tpu.train.cnn import CNNConfig, CNNState, init_cnn, cnn_step, make_cnn_step

__all__ = [
    "data_mesh",
    "distributed_init",
    "GANConfig",
    "GANState",
    "init_gan",
    "gan_step",
    "make_gan_step",
    "CNNConfig",
    "CNNState",
    "init_cnn",
    "cnn_step",
    "make_cnn_step",
]
