"""Noise power-spectral-density curves and PSD utilities.

Replaces the reference's `gen_psd` (ref: gw_template_maker.py:195-241), which
filled a LAL frequency series from the lalsimulation
``SimNoisePSDAdV*SensitivityP1200087`` C routines. Here the curves are
closed-form analytic fits evaluated directly on the rfft frequency grid as a
JAX array — no C library, trivially vmappable, and constant-foldable under
jit.

Note the actually-exercised path in the reference loads a *measured* PSD
ASCII file from a lalinference run (ref: gw_template_maker.py:767,787); that
loader lives in :mod:`gennet_tpu.data.lalinf_io`. The analytic curves below
cover the synthetic-noise path.

Analytic fits used (public literature):
- ``aLIGOZDHP``: the aLIGO zero-detuning high-power fit,
  S(f) = 1e-49 (x^-4.14 - 5 x^-2 + 111 (1 - x^2 + x^4/2) / (1 + x^2/2)),
  x = f/215 Hz  [arXiv:0903.0338].
- ``AdV*``: the Manzotti & Dietz analytic Advanced-Virgo fit, a sum of four
  log-parabola components in x = log(f/300 Hz), used as the base shape for
  every P1200087 scenario — matching the reference, which uses the AdV
  P1200087 family even for H1/L1 (ref: gw_template_maker.py:219-233).

LAL realizes the ``SimNoisePSDAdV*SensitivityP1200087`` family by
interpolating tabulated LIGO-P1200087-v18 data files, which are not
available in this environment. Each scenario here is therefore an analytic
approximation, quantitatively anchored: a scenario-era low-frequency wall is
applied to the AdV fit and the overall amplitude is calibrated so the
curve's computed binary-neutron-star (1.4+1.4 M☉, SNR 8, sky-averaged)
inspiral range equals the published P1200087/observing-scenarios range for
that configuration (Abbott et al., Living Reviews in Relativity 21:3).
:func:`bns_range_mpc` is the calibration integral and is unit-tested against
the published design ranges.
"""

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

# Advanced Virgo P1200087 observing scenarios: published BNS range [Mpc]
# (Living Reviews "Prospects" AdV table: early 20-65, mid 65-85, late 65-115,
# design 125) and the approximate low-frequency wall of each commissioning
# era (earlier configurations lose the band below ~30-40 Hz).
_SCENARIOS = {
    "AdvDesign": (125.0, 18.0),
    "AdvEarlyLow": (20.0, 40.0),
    "AdvEarlyHigh": (65.0, 40.0),
    "AdvMidLow": (65.0, 30.0),
    "AdvMidHigh": (85.0, 30.0),
    "AdvLateLow": (65.0, 25.0),
    "AdvLateHigh": (115.0, 25.0),
}

_G_SI = 6.67430e-11
_C_SI = 299792458.0
_MSUN_SI = 1.98892e30
_MPC_SI = 3.085677581491367e22


def bns_range_mpc(f: np.ndarray, psd_true: np.ndarray, rho0: float = 8.0,
                  f_min: float = 10.0, f_max: float = 1570.0) -> float:
    """Sky-averaged BNS (1.4+1.4 M☉) inspiral range of a PSD in true strain
    units: horizon distance at SNR ``rho0`` divided by the 2.2643 geometric
    averaging factor (the LIGO "sensemon range")."""
    f = np.asarray(f, np.float64)
    S = np.asarray(psd_true, np.float64)
    m = 1.4 * _MSUN_SI
    mc = (m * m) ** 0.6 / (2 * m) ** 0.2
    mask = (f >= f_min) & (f <= f_max) & np.isfinite(S) & (S > 0)
    I = np.trapezoid(f[mask] ** (-7.0 / 3.0) / S[mask], f[mask])
    d_h = np.sqrt(5.0 / 6.0 * np.pi ** (-4.0 / 3.0)
                  * (_G_SI * mc / _C_SI**3) ** (5.0 / 3.0) * I) * _C_SI / rho0
    return float(d_h / _MPC_SI / 2.2643)


def _adv_fit_true(f: np.ndarray) -> np.ndarray:
    """Manzotti-Dietz AdV analytic PSD in TRUE strain units (float64 host)."""
    x = np.log(np.where(f > 0, f, 1.0) / 300.0)
    asd = 1.259e-24 * (
        0.07 * np.exp(-0.142 - 1.437 * x + 0.407 * x**2)
        + 3.10 * np.exp(-0.466 - 1.043 * x - 0.548 * x**2)
        + 0.40 * np.exp(-0.304 + 2.896 * x - 0.293 * x**2)
        + 0.09 * np.exp(1.466 + 3.722 * x - 0.984 * x**2)
    )
    return asd**2


@lru_cache(maxsize=32)
def _scenario_calibration(op: str) -> tuple:
    """(amplitude², f_wall) such that the walled+scaled AdV curve's BNS range
    equals the published scenario range. Host-side float64, cached."""
    target, f_wall = _SCENARIOS[op]
    f = np.linspace(1.0, 4096.0, 65536)
    S = _adv_fit_true(f) * (1.0 + (f_wall / f) ** 8)
    r0 = bns_range_mpc(f, S)
    amp = r0 / target  # range scales as 1/amplitude
    return float(amp**2), float(f_wall)


def rfft_freqs(fs: float, T_obs: float) -> np.ndarray:
    """Frequency grid of the rfft layout: N//2+1 bins at df = 1/T_obs."""
    N = int(T_obs * fs)
    return np.arange(N // 2 + 1) / T_obs


def aligo_zdhp_psd(f: jnp.ndarray) -> jnp.ndarray:
    """aLIGO zero-detuning high-power analytic PSD fit [arXiv:0903.0338].

    Returned in the framework's scaled strain units (× STRAIN_SCALE², see
    :mod:`gennet_tpu.physics.constants`) so values stay in float32 range.
    """
    from gennet_tpu.physics.constants import STRAIN_SCALE

    x = f / 215.0
    x = jnp.where(x > 0, x, jnp.inf)  # DC handled by caller / regularize
    psd = (1e-49 * STRAIN_SCALE**2) * (
        x ** (-4.14) - 5.0 * x ** (-2) + 111.0 * (1.0 - x**2 + 0.5 * x**4) / (1.0 + 0.5 * x**2)
    )
    return jnp.where(jnp.isfinite(psd) & (psd > 0), psd, 0.0)


def advirgo_psd(f: jnp.ndarray) -> jnp.ndarray:
    """Advanced Virgo design analytic ASD fit (Manzotti & Dietz form), in
    scaled strain units (× STRAIN_SCALE²)."""
    from gennet_tpu.physics.constants import STRAIN_SCALE

    x = jnp.log(jnp.where(f > 0, f, 1.0) / 300.0)
    asd = (1.259e-24 * STRAIN_SCALE) * (
        0.07 * jnp.exp(-0.142 - 1.437 * x + 0.407 * x**2)
        + 3.10 * jnp.exp(-0.466 - 1.043 * x - 0.548 * x**2)
        + 0.40 * jnp.exp(-0.304 + 2.896 * x - 0.293 * x**2)
        + 0.09 * jnp.exp(1.466 + 3.722 * x - 0.984 * x**2)
    )
    psd = asd**2
    return jnp.where(f > 0, psd, 0.0)


def analytic_advligo_psd(fs: float, T_obs: float, op: str = "AdvDesign", det: str = "H1", f_low: float = 10.0) -> jnp.ndarray:
    """PSD on the rfft grid for a named scenario/detector.

    Mirrors the reference's `gen_psd(fs, T_obs, op, det)` surface
    (ref: gw_template_maker.py:195-241) including its quirk of serving the
    AdV P1200087 family for H1/L1. Every scenario curve is range-calibrated
    to the published P1200087 value (see module docstring). The extra op
    ``aLIGOZDHP`` exposes the aLIGO design fit for realistic LIGO synthetic
    noise. V1 is additionally supported (the reference exits with "will add
    Virgo soon"). Bins below ``f_low`` are zeroed, matching the LAL
    convention of the 10 Hz low-frequency cutoff passed by the reference.
    """
    if det not in ("H1", "L1", "V1"):
        raise ValueError(f"unknown detector {det!r}")
    f = jnp.asarray(rfft_freqs(fs, T_obs))
    if op == "aLIGOZDHP":
        psd = aligo_zdhp_psd(f)
    elif op in _SCENARIOS:
        amp2, f_wall = _scenario_calibration(op)
        wall = 1.0 + (f_wall / jnp.where(f > 0, f, jnp.inf)) ** 8
        psd = advirgo_psd(f) * (amp2 * wall)
    else:
        raise ValueError(f"unknown noise option {op!r}")
    return jnp.where(f >= f_low, psd, 0.0)


def regularize_psd(psd: jnp.ndarray, fs: float, T_obs: float, f_low: float = 10.0) -> jnp.ndarray:
    """Zero sub-f_low / non-finite / non-positive bins of an arbitrary PSD
    (e.g. a measured one) so downstream whitening is well-defined."""
    f = jnp.asarray(rfft_freqs(fs, T_obs))
    good = jnp.isfinite(psd) & (psd > 0) & (f >= f_low)
    return jnp.where(good, psd, 0.0)
