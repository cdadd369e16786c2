"""Generate the committed deterministic image fixture set.

Stand-in for the reference's tests/data/gwbush/*.jpg face images (530 jpgs,
ref: ganymede.py:64 signal_path): 16 seeded 64x64 greyscale "portrait-like"
composites (ellipse head, two eyes, mouth arc, graded background + texture),
enough structure for the image-GAN directory mode to train on and fully
reproducible from this script.
"""

import os

import numpy as np
from PIL import Image, ImageDraw

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "images")
N_IMG = 16
SIZE = 64


def make_face(rng: np.random.Generator) -> Image.Image:
    img = Image.new("L", (SIZE, SIZE), int(rng.uniform(30, 90)))
    d = ImageDraw.Draw(img)
    # graded background stripes
    for y in range(0, SIZE, 8):
        d.rectangle([0, y, SIZE, y + 4], fill=int(rng.uniform(25, 95)))
    # head ellipse
    cx, cy = SIZE // 2 + int(rng.uniform(-4, 4)), SIZE // 2 + int(rng.uniform(-4, 4))
    rx, ry = int(rng.uniform(16, 22)), int(rng.uniform(20, 26))
    d.ellipse([cx - rx, cy - ry, cx + rx, cy + ry], fill=int(rng.uniform(150, 220)))
    # eyes
    ey = cy - int(ry * 0.3)
    ex = int(rx * 0.45)
    er = int(rng.uniform(2, 4))
    for sx in (-1, 1):
        d.ellipse([cx + sx * ex - er, ey - er, cx + sx * ex + er, ey + er],
                  fill=int(rng.uniform(10, 50)))
    # mouth arc
    mw, mh = int(rx * 0.6), int(ry * 0.35)
    my = cy + int(ry * 0.35)
    d.arc([cx - mw, my - mh, cx + mw, my + mh], 20, 160,
          fill=int(rng.uniform(10, 60)), width=2)
    # speckle texture
    arr = np.asarray(img, np.float32)
    arr = np.clip(arr + rng.normal(0, 6, arr.shape), 0, 255)
    return Image.fromarray(arr.astype(np.uint8))


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(20260816)
    for i in range(N_IMG):
        make_face(rng).save(os.path.join(OUT, f"face{i:02d}.jpg"), quality=92)
    print(f"wrote {N_IMG} fixtures to {OUT}")


if __name__ == "__main__":
    main()
