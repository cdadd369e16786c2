"""lalinference-product interop tests against synthetic files in the exact
formats the reference consumes (ref: gw_template_maker.py:753-767,
get_lalinf_pars.py:39-91)."""

import numpy as np
import pytest

from gennet_tpu.data import lalinf_io
from gennet_tpu.physics.constants import STRAIN_SCALE


@pytest.fixture
def lalinf_dir(tmp_path):
    """Fabricate a lalinference engine output directory: FD data, data+inj,
    PSD ASCII, and a posterior HDF5."""
    fs, T_safe = 1024, 4
    Nf = fs * T_safe // 2 + 1
    rng = np.random.default_rng(0)
    f = np.arange(Nf) / T_safe

    psd = np.full(Nf, 1e-42)
    psd[f < 20] = 0.0

    # colored noise FD (continuous units) + an injected "signal"
    amp = np.sqrt(T_safe * psd / 4)
    noise_fd = amp * (rng.normal(size=Nf) + 1j * rng.normal(size=Nf))
    sig_fd = np.zeros(Nf, complex)
    band = (f > 40) & (f < 300)
    sig_fd[band] = 2e-22 * np.exp(-2j * np.pi * f[band] * 2.0)
    noise_fd[3] = np.nan + 1j * np.nan  # NaN scrubbing path (ref: :762-763)

    base = "lalinferencenest-0-H1-1126259462.0-0.hdf5H1"

    def write_fd(name, z):
        np.savetxt(tmp_path / name, np.stack([f, z.real, z.imag], -1))

    write_fd(f"{base}-freqData.dat", noise_fd)
    write_fd(f"{base}-freqDataWithInjection.dat", noise_fd + sig_fd)
    np.savetxt(tmp_path / f"{base}-PSD.dat", np.stack([f, psd], -1))

    # posterior HDF5 (plain h5py layout)
    import h5py

    mc = rng.normal(30.0, 1.5, 500)
    q = rng.uniform(0.6, 0.95, 500)
    with h5py.File(tmp_path / "posterior_samples.hdf5", "w") as hf:
        g = hf.create_group("lalinference/nest")
        g.create_dataset("mc", data=mc)
        g.create_dataset("q", data=q)
    return str(tmp_path), mc, q


def test_load_freq_data_scrubs_nans(lalinf_dir):
    d, _, _ = lalinf_dir
    z = lalinf_io.load_freq_data(
        f"{d}/lalinferencenest-0-H1-1126259462.0-0.hdf5H1-freqData.dat"
    )
    assert np.isfinite(z).all()
    assert z[3] == 0.0


def test_load_event_products(lalinf_dir):
    d, mc, q = lalinf_dir
    out = lalinf_io.load_event_products(d)
    assert out["measured_whitened"].shape == (1024,)
    assert out["signal_whitened"].shape == (1024,)
    # whitened measured data normalized to unit std over the safe window,
    # so central-1s std is O(1)
    assert 0.5 < np.std(out["measured_whitened"]) < 2.0
    assert np.isfinite(out["norm_constant"])
    # posterior found and converted
    post = out["posterior_mc_q"]
    np.testing.assert_allclose(np.sort(post[:, 0]), np.sort(mc))
    m1m2 = out["posterior_m1_m2"]
    assert (m1m2[:, 0] >= m1m2[:, 1]).all()


def test_posterior_mc_q_inverts_q_above_one(tmp_path):
    import h5py

    with h5py.File(tmp_path / "p.h5", "w") as hf:
        hf.create_dataset("mc", data=np.asarray([30.0]))
        hf.create_dataset("q", data=np.asarray([1.25]))  # m1/m2 convention
    mcq, m1m2 = lalinf_io.load_posterior_mc_q(str(tmp_path / "p.h5"))
    assert mcq[0, 1] == pytest.approx(0.8)


def test_bank_npz_roundtrip(tmp_path):
    t = np.random.default_rng(0).normal(size=(8, 64)).astype(np.float32)
    p = {"mc": np.arange(8.0), "q": np.linspace(0.5, 1, 8)}
    lalinf_io.save_bank_npz(str(tmp_path / "b.npz"), t, p)
    t2, p2 = lalinf_io.load_bank_npz(str(tmp_path / "b.npz"))
    np.testing.assert_array_equal(t, t2)
    np.testing.assert_array_equal(p["mc"], p2["mc"])
