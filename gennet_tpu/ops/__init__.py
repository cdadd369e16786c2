"""TPU-native compute ops: matmul-based real DFTs and Pallas kernels.

The axon TPU backend exposes no complex dtype support (no complex arithmetic
and no XLA FFT), so the framework's frequency-domain pipelines are built
complex-free: FD series travel as (amplitude, phase) or (re, im) float pairs
and the forward/inverse transforms are real matrix products that run on the
MXU — which for the bank sizes involved (N ≤ 8192) is also the fastest way
to do batched transforms on TPU.
"""

from gennet_tpu.ops.dft import irdft, rdft, irdft_matrices, rdft_matrices

__all__ = ["irdft", "rdft", "irdft_matrices", "rdft_matrices"]
