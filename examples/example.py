#!/usr/bin/env python
"""Library-consumer example: decode a JPEG with smoothing to a BMP.

The Python analogue of the reference's example.c (bitmap_read_jpeg +
bitmap_save, example.c:78-185): read JPEG -> smooth at the coefficient
level -> decode to pixels -> write a BMP, with a progress callback.

    python examples/example.py input.jpg output.bmp [quality] [niter]
"""

import os
import struct
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

if os.environ.get("JPEGQS_CACHE_DIR"):
    # Per-machine persistent-cache subdir + zlib codec (utils/cache.py)
    # — pointing JAX_COMPILATION_CACHE_DIR at the flat dir would load
    # other hosts' AOT code on rotated dev machines.
    from jpegqs_tpu.utils import cache as _qs_cache
    _qs_cache.setup(os.environ["JPEGQS_CACHE_DIR"])

from jpegqs_tpu import decode_smoothed, QsOptions


def write_bmp(path, pix):
    """Minimal 24-bit BMP writer (like example.c:33-76)."""
    if pix.ndim == 2:
        pix = pix[:, :, None].repeat(3, axis=2)
    h, w, _ = pix.shape
    row = (w * 3 + 3) & ~3
    size = 54 + row * h
    with open(path, "wb") as f:
        f.write(struct.pack("<2sIHHI", b"BM", size, 0, 0, 54))
        f.write(struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            row * h, 2835, 2835, 0, 0))
        pad = b"\0" * (row - w * 3)
        for y in range(h - 1, -1, -1):  # bottom-up, BGR
            f.write(pix[y, :, ::-1].tobytes() + pad)


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 1
    quality = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    niter = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    def progress(userdata, cur, total):
        print(f"\rprogress: {100 * cur // total}%", end="", flush=True)
        return 0  # return 1 to cancel

    opts = QsOptions.from_quality(quality, niter, progress=progress)
    with open(sys.argv[1], "rb") as f:
        pix = decode_smoothed(f.read(), opts)
    print()
    write_bmp(sys.argv[2], pix)
    print(f"wrote {sys.argv[2]}: {pix.shape[1]}x{pix.shape[0]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
