"""Detector antenna response, Earth-centre time delays, and FD time shifts.

Replaces three of the reference's C-library call sites:
- ``pylal.antenna.response`` (ref: gw_template_maker.py:612) → closed-form
  detector-tensor contraction (the LAL ComputeDetAMResponse formulation).
- ``lal.TimeDelayFromEarthCenter`` + ``DetectorPrefixToLALDetector``
  (ref: gw_template_maker.py:616-617) → geometric plane-wave delay with
  detector locations from :mod:`gennet_tpu.physics.constants`.
- the scipy cubic-spline time shift (ref: gw_template_maker.py:621-628) →
  an exact frequency-domain phase ramp, which is both faster and free of
  spline edge artifacts, and — unlike the reference, which computed the
  shifted series but returned the unshifted one (quirk at :626-630) —
  actually applied when requested.

All functions are elementwise-traceable and vmappable over batches of sky
positions / delays.
"""

import jax.numpy as jnp
import numpy as np

from gennet_tpu.physics import constants

# GPS→UTC leap-second table (cumulative GPS−UTC offset, effective-from GPS
# epoch seconds). Covers the advanced-detector era; earlier times use the
# earliest entry, which is fine at the accuracy GMST needs here.
_LEAP_TABLE = np.array(
    [
        (0, 0),
        (46828800, 1),      # 1981-07-01
        (78364801, 2),      # 1982-07-01
        (109900802, 3),     # 1983-07-01
        (173059203, 4),     # 1985-07-01
        (252028804, 5),     # 1988-01-01
        (315187205, 6),     # 1990-01-01
        (346723206, 7),     # 1991-01-01
        (393984007, 8),     # 1992-07-01
        (425520008, 9),     # 1993-07-01
        (457056009, 10),    # 1994-07-01
        (504489610, 11),    # 1996-01-01
        (551750411, 12),    # 1997-07-01
        (599184012, 13),    # 1999-01-01
        (820108813, 14),    # 2006-01-01
        (914803214, 15),    # 2009-01-01
        (1025136015, 16),   # 2012-07-01
        (1119744016, 17),   # 2015-07-01
        (1167264017, 18),   # 2017-01-01
    ],
    dtype=np.float64,
)


def gps_to_gmst(gps) -> np.ndarray:
    """Greenwich mean sidereal time [rad] from a GPS time.

    UT1 ≈ UTC = GPS − leap(GPS); GMST via the USNO linear approximation
    (error ≪ 1 s over the detector era, i.e. ≪ 1e-4 rad — far below the
    antenna-pattern sensitivity to sky position).

    Host-side numpy float64: GPS epochs (~1e9 s) lose ~64 s of precision in
    float32, so this geometry is always evaluated on the host and folded
    into device programs as compile-time constants (the reference likewise
    computes it once per template on the CPU via LAL).
    """
    gps = np.asarray(gps, np.float64)
    idx = np.searchsorted(_LEAP_TABLE[:, 0], gps, side="right") - 1
    leap = _LEAP_TABLE[:, 1][idx]
    utc = gps - leap
    # days of UT1 since J2000.0 (JD 2451545.0); GPS epoch JD = 2444244.5
    d = (utc / 86400.0) + 2444244.5 - 2451545.0
    gmst_hours = 18.697374558 + 24.06570982441908 * d
    return np.mod(gmst_hours, 24.0) * (2.0 * np.pi / 24.0)


def _polarization_basis(ra, dec, psi, gmst):
    """LAL-convention polarization axis vectors X, Y in Earth-fixed frame."""
    gha = gmst - ra
    cg, sg = np.cos(gha), np.sin(gha)
    cd, sd = np.cos(dec), np.sin(dec)
    cp, sp = np.cos(psi), np.sin(psi)
    X = np.stack(
        [-cp * sg - sp * cg * sd, -cp * cg + sp * sg * sd, sp * cd * np.ones_like(gha)], axis=-1
    )
    Y = np.stack(
        [sp * sg - cp * cg * sd, sp * cg + cp * sg * sd, cp * cd * np.ones_like(gha)], axis=-1
    )
    return X, Y


def antenna_response(gps_time, ra, dec, psi, det: str = "H1"):
    """(F+, F×) for a detector at a GPS time — LAL ComputeDetAMResponse.

    Scalar or batched ra/dec/psi/gps (numpy broadcasting; float64 host math).
    Replaces ``pylal.antenna.response`` (ref: gw_template_maker.py:612).
    """
    d = constants.detector_tensor(det)
    gmst = gps_to_gmst(gps_time)
    X, Y = _polarization_basis(
        np.asarray(ra, np.float64), np.asarray(dec, np.float64),
        np.asarray(psi, np.float64), gmst,
    )
    dX = np.einsum("ij,...j->...i", d, X)
    dY = np.einsum("ij,...j->...i", d, Y)
    fplus = np.sum(X * dX, axis=-1) - np.sum(Y * dY, axis=-1)
    fcross = np.sum(X * dY, axis=-1) + np.sum(Y * dX, axis=-1)
    return fplus, fcross


def time_delay_from_earth_center(gps_time, ra, dec, det: str = "H1"):
    """t_detector − t_geocenter [s] for a plane wave from (ra, dec).

    Replaces ``lal.TimeDelayFromEarthCenter`` (ref: gw_template_maker.py:617):
    Δt = −(r_det · n̂_src)/c with n̂ the Earth-fixed unit vector toward the
    source. Host numpy float64 (see :func:`gps_to_gmst`).
    """
    loc = np.asarray(constants.DETECTORS[det]["location"], np.float64)
    gmst = gps_to_gmst(gps_time)
    gha = gmst - np.asarray(ra, np.float64)
    dec = np.asarray(dec, np.float64)
    n = np.stack(
        [np.cos(dec) * np.cos(-gha), np.cos(dec) * np.sin(-gha), np.sin(dec) * np.ones_like(gha)],
        axis=-1,
    )
    return -np.sum(loc * n, axis=-1) / constants.C_SI


def fd_time_shift_phase(phase: jnp.ndarray, dt_shift, T_obs: float) -> jnp.ndarray:
    """Phase-representation time shift: for h̃ = amp·e^{−iΨ}, delaying by
    ``dt_shift`` seconds is Ψ → Ψ + 2πf·Δt. Complex-free (TPU path)."""
    nf = phase.shape[-1]
    f = (jnp.arange(nf) / T_obs).astype(phase.dtype)
    return phase + 2.0 * jnp.pi * f * jnp.asarray(dt_shift, phase.dtype)[..., None]


def fd_time_shift(htilde: jnp.ndarray, dt_shift, T_obs: float) -> jnp.ndarray:
    """Shift a frequency-domain (rfft-layout) series later in time by
    ``dt_shift`` seconds via the exact phase ramp exp(−2πi f Δt).

    ``dt_shift`` may be batched; broadcasts against htilde's leading axes.
    """
    nf = htilde.shape[-1]
    f = jnp.arange(nf) / T_obs
    dt_shift = jnp.asarray(dt_shift)[..., None]
    return htilde * jnp.exp(-2j * jnp.pi * f * dt_shift).astype(htilde.dtype)
