"""Make shifted/cropped test images.

Reference analogue: python_src/scripts/image_editing.py:4-15 (produces the
15pt_star_shifted_150.png fixture by rolling the image 150 px along x).
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("image")
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--shift-x", type=int, default=150)
    ap.add_argument("--shift-y", type=int, default=0)
    args = ap.parse_args(argv)

    from photogrammetry_tpu.io.image import read_image, write_image

    img = read_image(args.image)
    out = np.zeros_like(img)
    sx, sy = args.shift_x, args.shift_y
    src = img[max(-sy, 0):img.shape[0] - max(sy, 0),
              max(-sx, 0):img.shape[1] - max(sx, 0)]
    out[max(sy, 0):max(sy, 0) + src.shape[0],
        max(sx, 0):max(sx, 0) + src.shape[1]] = src
    path = args.output or args.image.rsplit(".", 1)[0] + \
        f"_shifted_{sx}.png"
    write_image(path, out)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
