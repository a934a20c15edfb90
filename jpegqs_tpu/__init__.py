"""jpegqs_tpu — TPU-native quantization-constrained JPEG restoration.

A from-scratch JAX/XLA/Pallas re-implementation of the capabilities of
ilyakurdyukov/jpeg-quantsmooth: iterative re-estimation of JPEG DCT
coefficients to minimize pixel-domain discontinuities subject to the
hard re-quantization interval constraint, with JOINT_YUV, DIAGONALS,
LOW_QUALITY and UPSAMPLE_UV modes (reference: README.md:41-53).

Public API:
  smooth(img, opts)            -- coefficient-level engine
  smooth_jpeg_bytes(data, opts)-- JPEG bytes -> smoothed JPEG bytes
  QsOptions / quality_to_flags -- option surface (libjpegqs.h:14-45)
  host.jpegio                  -- host-side entropy codec runtime
"""

from .options import (QsOptions, quality_to_flags, DIAGONALS, JOINT_YUV,
                      UPSAMPLE_UV, LOW_QUALITY, NO_REBALANCE,
                      NO_REBALANCE_UV, TRANSCODE, ITER_MAX)

__version__ = "0.1.0"

__all__ = [
    "QsOptions", "quality_to_flags", "DIAGONALS", "JOINT_YUV",
    "UPSAMPLE_UV", "LOW_QUALITY", "NO_REBALANCE", "NO_REBALANCE_UV",
    "TRANSCODE", "ITER_MAX", "smooth", "smooth_jpeg_bytes",
    "decode_smoothed", "smooth_many", "smooth_plane_batch",
    "smooth_image_batch",
]


def smooth(img, opts):
    from . import engine
    return engine.smooth(img, opts)


def smooth_jpeg_bytes(data, opts=None, optimize=False):
    from . import engine
    return engine.smooth_jpeg_bytes(data, opts, optimize)


def decode_smoothed(data, opts=None):
    from . import engine
    return engine.decode_smoothed(data, opts)


def smooth_many(datas, opts=None, workers=4, optimize=False):
    from . import batch
    return batch.smooth_many(datas, opts, workers, optimize)


def smooth_plane_batch(coefs, qtbl, flags, niter, luma=True):
    from . import batch
    return batch.smooth_plane_batch(coefs, qtbl, flags, niter, luma)


def smooth_image_batch(imgs, opts=None):
    from . import batch
    return batch.smooth_image_batch(imgs, opts)
