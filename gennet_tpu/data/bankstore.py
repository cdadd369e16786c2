"""Python bindings for the native bank store (ctypes over native/bankstore.cpp).

Checksummed, memory-mapped template-bank files with a multithreaded writer
and batch-gather server — the native data layer replacing the reference's
cPickle block dumps/loads (ref: gw_template_maker.py:842-863,
bbhMahoGANy.py:969-1005). The shared library is built on first use with the
in-image g++ (no pybind11 dependency; plain C ABI).
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libbankstore.so")
_lock = threading.Lock()
_lib = None

PARAM_ORDER = ("mc", "q", "m1", "m2", "eta", "M", "idx")


def _build():
    subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True)


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.gntb_write.restype = ctypes.c_int
        lib.gntb_write.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_uint64,
            ctypes.c_uint32, ctypes.POINTER(ctypes.c_float), ctypes.c_uint32,
            ctypes.c_int,
        ]
        lib.gntb_open.restype = ctypes.c_void_p
        lib.gntb_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.gntb_n.restype = ctypes.c_uint64
        lib.gntb_n.argtypes = [ctypes.c_void_p]
        lib.gntb_n_pix.restype = ctypes.c_uint32
        lib.gntb_n_pix.argtypes = [ctypes.c_void_p]
        lib.gntb_n_par.restype = ctypes.c_uint32
        lib.gntb_n_par.argtypes = [ctypes.c_void_p]
        lib.gntb_templates.restype = ctypes.POINTER(ctypes.c_float)
        lib.gntb_templates.argtypes = [ctypes.c_void_p]
        lib.gntb_params.restype = ctypes.POINTER(ctypes.c_float)
        lib.gntb_params.argtypes = [ctypes.c_void_p]
        lib.gntb_gather.restype = ctypes.c_int
        lib.gntb_gather.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.gntb_close.restype = None
        lib.gntb_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def _fptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def write_bank(path: str, templates: np.ndarray, params: dict | np.ndarray,
               n_threads: int = 8):
    """Write a bank file. ``params`` may be a dict of per-template arrays
    (stored in PARAM_ORDER where present) or an (n, n_par) array."""
    lib = _load()
    templates = np.ascontiguousarray(templates, np.float32)
    if isinstance(params, dict):
        cols = [np.asarray(params[k], np.float32) for k in PARAM_ORDER if k in params]
        pmat = np.ascontiguousarray(np.stack(cols, -1)) if cols else np.zeros((len(templates), 0), np.float32)
    else:
        pmat = np.ascontiguousarray(params, np.float32)
    rc = lib.gntb_write(
        path.encode(), _fptr(templates), templates.shape[0], templates.shape[1],
        _fptr(pmat), pmat.shape[1], n_threads,
    )
    if rc != 0:
        raise OSError(f"gntb_write failed with code {rc}")


class BankStore:
    """Memory-mapped read handle: zero-copy numpy views + threaded gather."""

    def __init__(self, path: str, verify: bool = True, n_threads: int = 8):
        self._lib = _load()
        self._h = self._lib.gntb_open(path.encode(), int(verify), n_threads)
        if not self._h:
            raise OSError(f"failed to open bank {path!r} (corrupt or missing)")
        self.n = int(self._lib.gntb_n(self._h))
        self.n_pix = int(self._lib.gntb_n_pix(self._h))
        self.n_par = int(self._lib.gntb_n_par(self._h))
        self._n_threads = n_threads

    @property
    def templates(self) -> np.ndarray:
        """Zero-copy view of the full template matrix (n, n_pix)."""
        ptr = self._lib.gntb_templates(self._h)
        return np.ctypeslib.as_array(ptr, shape=(self.n, self.n_pix))

    @property
    def params(self) -> np.ndarray:
        ptr = self._lib.gntb_params(self._h)
        return np.ctypeslib.as_array(ptr, shape=(self.n, self.n_par))

    def gather(self, idx: np.ndarray):
        """Threaded random-row batch fetch → (templates, params) copies."""
        idx = np.ascontiguousarray(idx, np.uint64)
        out_t = np.empty((len(idx), self.n_pix), np.float32)
        out_p = np.empty((len(idx), self.n_par), np.float32)
        rc = self._lib.gntb_gather(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            len(idx), _fptr(out_t), _fptr(out_p), self._n_threads,
        )
        if rc != 0:
            raise IndexError("gather index out of range")
        return out_t, out_p

    def close(self):
        if self._h:
            self._lib.gntb_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
