"""Pure-function GW signal physics, vmap/jit-safe, replacing lalsuite C calls.

Every function here is shape-static and traceable; the hot paths are designed
to fuse into single XLA programs (FFT whitening + phase-ramp time shifts stay
in the frequency domain; no host round trips).
"""

from gennet_tpu.physics import constants
from gennet_tpu.physics.windows import tukey
from gennet_tpu.physics.whiten import whiten_fd, whiten_td, whitening_gain
from gennet_tpu.physics.noise import colored_noise, white_noise
from gennet_tpu.physics.psd import analytic_advligo_psd, regularize_psd
from gennet_tpu.physics.burst import sine_gaussian, sample_burst_params
from gennet_tpu.physics.priors import sample_masses, chirp_mass_eta, mc_q_to_m1m2
from gennet_tpu.physics.detector import (
    antenna_response,
    time_delay_from_earth_center,
    fd_time_shift,
    fd_time_shift_phase,
)
from gennet_tpu.physics.waveform import imrphenomd_ampphase, imrphenomd_htilde, taylorf2_htilde

__all__ = [
    "constants",
    "tukey",
    "whiten_fd",
    "whiten_td",
    "whitening_gain",
    "fd_time_shift_phase",
    "imrphenomd_ampphase",
    "colored_noise",
    "white_noise",
    "analytic_advligo_psd",
    "regularize_psd",
    "sine_gaussian",
    "sample_burst_params",
    "sample_masses",
    "chirp_mass_eta",
    "mc_q_to_m1m2",
    "antenna_response",
    "time_delay_from_earth_center",
    "fd_time_shift",
    "imrphenomd_htilde",
    "taylorf2_htilde",
]
