"""Image-directory ingestion for the gen-1 image-GAN mode.

ref: tests/ganymede.py:272-314 — load a directory of images (the reference
ships tests/data/gwbush/*.jpg), convert to greyscale, resize to
n_pix × n_pix, rescale to [−1, 1], optionally append horizontally-flipped
copies.
"""

import glob

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
