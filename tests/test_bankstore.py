"""Native bank-store tests (C++ mmap writer/reader/gather via ctypes)."""

import numpy as np
import pytest

from gennet_tpu.data import bankstore


@pytest.fixture(scope="module")
def bank_data():
    rng = np.random.default_rng(0)
    t = rng.normal(size=(512, 256)).astype(np.float32)
    p = {"mc": rng.uniform(20, 35, 512).astype(np.float32),
         "q": rng.uniform(0.5, 1.0, 512).astype(np.float32)}
    return t, p


def test_write_open_roundtrip(tmp_path, bank_data):
    t, p = bank_data
    path = str(tmp_path / "bank.gntb")
    bankstore.write_bank(path, t, p)
    with bankstore.BankStore(path) as store:
        assert (store.n, store.n_pix, store.n_par) == (512, 256, 2)
        np.testing.assert_array_equal(store.templates, t)
        np.testing.assert_array_equal(store.params[:, 0], p["mc"])
        np.testing.assert_array_equal(store.params[:, 1], p["q"])


def test_gather_matches_numpy(tmp_path, bank_data):
    t, p = bank_data
    path = str(tmp_path / "bank.gntb")
    bankstore.write_bank(path, t, p)
    idx = np.random.default_rng(1).integers(0, 512, 64)
    with bankstore.BankStore(path) as store:
        gt, gp = store.gather(idx)
        np.testing.assert_array_equal(gt, t[idx])
        np.testing.assert_array_equal(gp[:, 0], p["mc"][idx])


def test_gather_bad_index_raises(tmp_path, bank_data):
    t, p = bank_data
    path = str(tmp_path / "bank.gntb")
    bankstore.write_bank(path, t, p)
    with bankstore.BankStore(path) as store:
        with pytest.raises(IndexError):
            store.gather(np.asarray([1_000_000]))


def test_corruption_detected(tmp_path, bank_data):
    t, p = bank_data
    path = str(tmp_path / "bank.gntb")
    bankstore.write_bank(path, t, p)
    raw = bytearray(open(path, "rb").read())
    raw[64 + 1000] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(OSError):
        bankstore.BankStore(path, verify=True)
    # unverified open still works (fast path)
    store = bankstore.BankStore(path, verify=False)
    store.close()
