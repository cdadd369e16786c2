"""Image ingestion for the gen-1 image-GAN modes.

ref: tests/ganymede.py:272-314 — three input modes:
- directory of images (the reference ships tests/data/gwbush/*.jpg):
  convert to greyscale, resize to n_pix × n_pix, rescale to [−1, 1],
  optionally append horizontally-flipped copies (:func:`load_image_dir`);
- MNIST (the reference pulls it through tensorflow's input_data, :283-287):
  here a dependency-free IDX-format reader over a local file
  (:func:`load_mnist_idx`) — this environment has no network egress, so the
  data must be provided as the standard train-images-idx3-ubyte file;
- parameterized Gaussian blobs (lives in physics/blobs.py).
"""

import glob
import gzip
import struct

import numpy as np


def load_image_dir(pattern: str, n_pix: int = 28, flip: bool = True, limit: int | None = None) -> np.ndarray:
    """Load images matching ``pattern`` → (N, n_pix, n_pix, 1) in [−1, 1]."""
    try:
        from PIL import Image

        def read(p):
            return np.asarray(Image.open(p).convert("L").resize((n_pix, n_pix)), np.float32)
    except ImportError:  # PIL-free fallback
        import matplotlib.image as mpimg

        def read(p):
            img = mpimg.imread(p)
            if img.ndim == 3:
                img = img.mean(-1)
            # nearest-neighbour resize
            yi = (np.linspace(0, img.shape[0] - 1, n_pix)).astype(int)
            xi = (np.linspace(0, img.shape[1] - 1, n_pix)).astype(int)
            return img[np.ix_(yi, xi)].astype(np.float32)

    paths = sorted(glob.glob(pattern))
    if limit:
        paths = paths[:limit]
    if not paths:
        raise FileNotFoundError(f"no images match {pattern!r}")
    out = []
    for p in paths:
        img = read(p)
        lo, hi = img.min(), img.max()
        img = (2 * (img - lo) / max(hi - lo, 1e-9)) - 1.0
        out.append(img)
        if flip:
            out.append(img[:, ::-1])
    return np.asarray(out)[..., None]


def load_mnist_idx(path: str, n_pix: int = 28, limit: int | None = None) -> np.ndarray:
    """Read an MNIST IDX3 image file (optionally .gz) → (N, n_pix, n_pix, 1)
    rescaled to [−1, 1] (the reference's mnist mode, ganymede.py:283-287,
    without the tensorflow dependency).

    IDX3 layout: big-endian magic 0x00000803, N, rows, cols, then uint8
    pixels. ``n_pix`` resizes by nearest neighbour as the reference's
    PIL.resize did.
    """
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as fh:
        magic, n, rows, cols = struct.unpack(">IIII", fh.read(16))
        if magic != 0x803:
            raise ValueError(f"{path!r} is not an IDX3 image file (magic {magic:#x})")
        if limit:
            n = min(n, limit)
        data = np.frombuffer(fh.read(n * rows * cols), np.uint8, count=n * rows * cols)
    imgs = data.reshape(n, rows, cols).astype(np.float32)
    if n_pix != rows or n_pix != cols:
        yi = np.linspace(0, rows - 1, n_pix).astype(int)
        xi = np.linspace(0, cols - 1, n_pix).astype(int)
        imgs = imgs[:, np.ix_(yi, xi)[0], np.ix_(yi, xi)[1]]
    return (imgs / 127.5 - 1.0)[..., None]
