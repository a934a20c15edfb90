"""Batch engine: batched results == per-image engine results."""

import numpy as np
import pytest

from jpegqs_tpu import engine, batch
from jpegqs_tpu.host import jpegio
from jpegqs_tpu.options import QsOptions
from util import make_jpeg


def test_smooth_many_matches_sequential():
    datas = [make_jpeg(48, 48, "photo", seed=s, quality=70)
             for s in range(4)]
    datas.append(make_jpeg(48, 64, "photo", seed=9, color=True,
                           quality=60, subsamp=1))
    opts = QsOptions.from_quality(3, 3)
    seq = [engine.smooth_jpeg_bytes(d, opts) for d in datas]
    par = batch.smooth_many(datas, opts, workers=3)
    assert seq == par


@pytest.mark.parametrize("quality", [0, 3, 4])
def test_plane_batch_matches_engine(quality):
    from jpegqs_tpu.options import quality_to_flags

    datas = [make_jpeg(48, 48, "photo", seed=s, quality=70)
             for s in range(3)]
    imgs = [jpegio.read_coefficients(d) for d in datas]
    qtbl = imgs[0].components[0].quantval
    for im in imgs:
        assert np.array_equal(im.components[0].quantval, qtbl)
    coefs = np.stack([im.components[0].coefs for im in imgs])
    flags = quality_to_flags(quality)

    got = batch.smooth_plane_batch(coefs, qtbl, flags, 3)
    opts = QsOptions(flags=flags, niter=3)
    for i, im in enumerate(imgs):
        want = engine.smooth(im, opts).coefs[0]
        assert np.array_equal(got[i], want), f"image {i}"


@pytest.mark.parametrize("quality", [3, 5, 6, 0])
def test_image_batch_matches_engine(quality):
    """Whole-image color batching == per-image engine, all paths."""
    from jpegqs_tpu.batch import smooth_image_batch

    datas = [make_jpeg(48, 64, "photo", seed=100 + s, color=True,
                       quality=70, subsamp=1) for s in range(3)]
    imgs = [jpegio.read_coefficients(d) for d in datas]
    opts = QsOptions.from_quality(quality, 3)
    got = smooth_image_batch(imgs, opts)
    for i, im in enumerate(imgs):
        want = engine.smooth(im, opts)
        for ci in range(3):
            assert np.array_equal(got[i].coefs[ci], want.coefs[ci]), \
                f"img {i} comp {ci}"
        assert (got[i].upsampled is None) == (want.upsampled is None)
        if want.upsampled is not None:
            for k in range(2):
                assert np.array_equal(got[i].upsampled[k],
                                      want.upsampled[k]), f"img {i} up {k}"


def test_image_batch_nonuniform_fallback():
    from jpegqs_tpu.batch import smooth_image_batch

    datas = [make_jpeg(48, 64, "photo", seed=1, color=True, quality=70),
             make_jpeg(40, 64, "photo", seed=2, color=True, quality=70)]
    imgs = [jpegio.read_coefficients(d) for d in datas]
    opts = QsOptions.from_quality(3, 3)
    got = smooth_image_batch(imgs, opts)
    for i, im in enumerate(imgs):
        want = engine.smooth(im, opts)
        for ci in range(3):
            assert np.array_equal(got[i].coefs[ci], want.coefs[ci])


@pytest.mark.parametrize("quality", [3, 6])
def test_smooth_corpus_mixed_buckets(quality):
    """Mixed-size/quality corpus: bucketed batch programs + fallback
    singles produce byte-identical output to sequential processing."""
    datas = []
    for s in range(3):   # bucket A: same geometry + qtables
        datas.append(make_jpeg(48, 48, "photo", seed=s, quality=70))
    for s in range(3):   # bucket B: color 4:2:0
        datas.append(make_jpeg(64, 48, "photo", seed=10 + s, color=True,
                               quality=60, subsamp=1))
    # singletons: odd size, different qtable, 4:4:4
    datas.append(make_jpeg(40, 56, "edges", seed=20, quality=85))
    datas.append(make_jpeg(48, 48, "photo", seed=21, quality=50))
    datas.append(make_jpeg(48, 48, "flat", seed=22, color=True,
                           quality=70, subsamp=0))
    opts = QsOptions.from_quality(quality, 2)
    seq = [engine.smooth_jpeg_bytes(d, opts) for d in datas]
    got = batch.smooth_corpus(datas, opts, workers=4, max_batch=2,
                              window=2)
    assert got == seq


def test_smooth_corpus_decode_error():
    datas = [make_jpeg(48, 48, "photo", seed=1, quality=70), b"garbage"]
    with pytest.raises(ValueError):
        batch.smooth_corpus(datas, QsOptions.from_quality(3, 1))
