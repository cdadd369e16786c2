"""IMRPhenomD golden validation (VERDICT round-1 item 3).

Three layers:
1. the committed golden JSON is exactly what the independent float64
   re-derivation (tests/goldens/phenomd_independent.py — numpy-only, no
   gennet_tpu imports, per-coefficient explicit Table-V expressions)
   produces — guards the golden file;
2. the repo's table-driven JAX path reproduces the goldens in float64 to
   1e-8 — a transcription error in any single fit constant in either copy
   (4th significant digit or better) breaks this, proven by the meta-test;
3. the float32 TPU-path waveform keeps whitened-domain overlap > 0.9999
   against the float64 independent waveform across the hunt_constrain mass
   range and beyond ("CPU-tolerance-matched", BASELINE.json; ref call
   surface: gw_template_maker.py:507-516).
"""

import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gennet_tpu.physics import psd as psd_mod
from gennet_tpu.physics import waveform, whiten

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "goldens"))
import phenomd_independent as indep  # noqa: E402

GOLDENS = json.load(open(os.path.join(os.path.dirname(__file__),
                                      "goldens", "phenomd_goldens.json")))

# tolerances sized so a 4th-significant-digit error in one Table-V constant
# (phase shifts of ≳0.01 rad, amplitude shifts ≳1e-5 relative) fails
PHASE_ATOL = 1e-6      # rad, float64 vs float64
AMP_RTOL = 1e-8


def test_goldens_match_independent_rederivation():
    """The committed JSON is the independent model's output (file guard)."""
    regen = indep.generate()
    for got, exp in zip(regen["rows"], GOLDENS["rows"]):
        assert got["m1"] == exp["m1"] and got["m2"] == exp["m2"]
        np.testing.assert_allclose(got["amp"], exp["amp"], rtol=1e-14)
        np.testing.assert_allclose(got["phase"], exp["phase"], rtol=0, atol=1e-10)


def test_repo_float64_matches_goldens(x64):
    for row in GOLDENS["rows"]:
        freqs = jnp.asarray(row["freqs"], jnp.float64)
        amp, phase = waveform.imrphenomd_ampphase(freqs, row["m1"], row["m2"])
        np.testing.assert_allclose(np.asarray(amp), row["amp"], rtol=AMP_RTOL,
                                   err_msg=f"amp m=({row['m1']},{row['m2']})")
        np.testing.assert_allclose(np.asarray(phase), row["phase"], rtol=0,
                                   atol=PHASE_ATOL,
                                   err_msg=f"phase m=({row['m1']},{row['m2']})")


def test_single_constant_error_fails_goldens(x64):
    """Meta-test of the validation's sensitivity: perturbing ONE fit constant
    in its 4th significant digit must break test_repo_float64_matches_goldens'
    tolerances at some golden point (VERDICT #3 'done' criterion)."""
    row = GOLDENS["rows"][0]
    freqs = jnp.asarray(row["freqs"], jnp.float64)
    orig = waveform._FIT_TABLE.copy()
    try:
        for name, j in (("sigma1", 0), ("beta2", 1), ("alpha4", 0),
                        ("rho1", 0), ("gamma3", 0), ("v2", 0)):
            i = waveform._FIT_NAMES.index(name)
            waveform._FIT_TABLE = orig.copy()
            waveform._FIT_TABLE[i, j] *= 1.0 + 1e-4  # 4th significant digit
            amp, phase = waveform.imrphenomd_ampphase(freqs, row["m1"], row["m2"])
            amp_bad = np.any(np.abs(np.asarray(amp) - row["amp"])
                             > AMP_RTOL * np.abs(row["amp"]))
            ph_bad = np.any(np.abs(np.asarray(phase) - row["phase"]) > PHASE_ATOL)
            assert amp_bad or ph_bad, f"perturbing {name}[{j}] went undetected"
    finally:
        waveform._FIT_TABLE = orig


def _whitened_overlap(a1, p1, a2, p2, gain):
    """Whitened-domain match, maximized over time/phase shifts to quadratic
    order (weighted linear fit of the phase difference removed) — the
    standard matched-filter overlap's free constants."""
    w2 = (gain**2) * a1 * a2
    dp = p1 - p2
    # remove best-fit (phi0 + 2*pi*f*dt) weighted by w2
    f = np.arange(len(dp), dtype=np.float64)
    W = w2.sum()
    fbar = (w2 * f).sum() / W
    dbar = (w2 * dp).sum() / W
    slope = ((w2 * (f - fbar) * (dp - dbar)).sum()
             / ((w2 * (f - fbar) ** 2).sum() + 1e-300))
    dp = dp - dbar - slope * (f - fbar)
    num = np.abs((w2 * np.exp(1j * dp)).sum())
    den = np.sqrt(((gain * a1) ** 2).sum() * ((gain * a2) ** 2).sum())
    return num / den


@pytest.mark.parametrize("m1,m2", [(20.0, 20.0), (40.0, 40.0), (60.0, 40.0),
                                   (36.0, 29.0), (30.0, 15.0), (50.0, 10.0)])
def test_float32_path_overlap_vs_float64(m1, m2):
    """The float32 (TPU) waveform is indistinguishable from the float64
    reference at matched-filter level: whitened overlap > 0.9999."""
    fs, T_safe = 1024, 4
    freqs64 = np.arange(fs * T_safe // 2 + 1) / T_safe
    a64, p64 = indep.htilde_ampphase(freqs64, m1, m2)

    freqs32 = jnp.asarray(freqs64, jnp.float32)
    a32, p32 = waveform.imrphenomd_ampphase(freqs32, m1, m2)
    assert a32.dtype == jnp.float32

    psd = np.asarray(psd_mod.analytic_advligo_psd(fs, T_safe), np.float64)
    gain = np.asarray(whiten.whitening_gain(jnp.asarray(psd), fs), np.float64)

    ov = _whitened_overlap(np.asarray(a32, np.float64), np.asarray(p32, np.float64),
                           a64, p64, gain)
    assert ov > 0.9999, f"float32 overlap {ov} at ({m1},{m2})"
