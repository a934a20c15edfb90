"""Shared test utilities: corpus generation and reference-binary oracle."""

from __future__ import annotations

import os
import subprocess
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BIN = os.path.join(REPO, ".ref", "jpegqs_scalar")


def ensure_reference() -> str:
    """Build (if needed) and return the scalar reference oracle binary."""
    if not os.path.exists(REF_BIN):
        subprocess.run([os.path.join(REPO, "tools", "build_reference.sh")],
                       check=True, capture_output=True)
    return REF_BIN


def run_reference(data: bytes, quality: int = 3, niter: int = 3,
                  extra_args=()) -> bytes:
    """Run the scalar reference binary on JPEG bytes, return output bytes."""
    ensure_reference()
    with tempfile.TemporaryDirectory() as d:
        inp = os.path.join(d, "in.jpg")
        out = os.path.join(d, "out.jpg")
        with open(inp, "wb") as f:
            f.write(data)
        cmd = [REF_BIN, "-q", str(quality), "-n", str(niter), "-i", "0",
               *extra_args, inp, out]
        r = subprocess.run(cmd, capture_output=True)
        if r.returncode not in (0, 2):
            raise RuntimeError(f"reference failed: {r.stderr.decode()}")
        with open(out, "rb") as f:
            return f.read()


def synth_image(h: int, w: int, kind: str = "photo", seed: int = 0,
                color: bool = False) -> np.ndarray:
    """Deterministic synthetic test images with photo-like content."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    if kind == "photo":
        img = (128 + 60 * np.sin(xx * 0.07 + np.sin(yy * 0.05) * 3)
               + 40 * np.cos(yy * 0.11) + 15 * np.sin((xx + yy) * 0.21))
        img += rng.normal(0, 4, (h, w))
        # some edges
        img[(yy.astype(int) // 24 + xx.astype(int) // 31) % 5 == 0] += 55
    elif kind == "edges":
        img = np.full((h, w), 90.0)
        img[(xx.astype(int) // 13) % 2 == 0] += 100
        img[(yy.astype(int) // 9) % 3 == 0] -= 60
        img += rng.normal(0, 2, (h, w))
    elif kind == "flat":
        img = np.full((h, w), 130.0) + rng.normal(0, 1.5, (h, w))
    elif kind == "noise":
        img = rng.uniform(0, 255, (h, w))
    else:
        raise ValueError(kind)
    g = np.clip(img, 0, 255).astype(np.uint8)
    if not color:
        return g
    r = np.clip(img + 30 * np.sin(xx * 0.03), 0, 255).astype(np.uint8)
    b = np.clip(img - 25 * np.cos(yy * 0.04), 0, 255).astype(np.uint8)
    if color == "cmyk":
        k = np.clip(255 - img * 0.7, 0, 255).astype(np.uint8)
        return np.stack([r, g, b, k], axis=-1)
    return np.stack([r, g, b], axis=-1)


def make_jpeg(h: int, w: int, kind: str = "photo", seed: int = 0,
              color: bool = False, quality: int = 75, subsamp: int = 1,
              progressive: bool = False, arith: bool = False,
              restart_interval: int = 0) -> bytes:
    from jpegqs_tpu.host import jpegio
    return jpegio.encode_pixels(synth_image(h, w, kind, seed, color),
                                quality=quality, subsamp=subsamp,
                                progressive=progressive, arith=arith,
                                restart_interval=restart_interval)


def coef_arrays(data: bytes):
    """Parse JPEG bytes -> list of (coefs int16[hb,wb,64], quantval u16[64])."""
    from jpegqs_tpu.host import jpegio
    img = jpegio.read_coefficients(data)
    return [(c.coefs, c.quantval) for c in img.components]


def first_mismatch(a: np.ndarray, b: np.ndarray):
    """Locate and describe the first mismatching block coefficient."""
    if np.array_equal(a, b):
        return None
    idx = np.argwhere(a != b)
    i = tuple(idx[0])
    return {"index": i, "got": a[i], "want": b[i], "count": len(idx)}
