"""Large-image differential tests (TPU-gated).

Rounding bugs in approximate hardware units only surface at scale:
TPU's 2-ulp divider passed every small-image test and first broke on a
4K q6 run (~3e-5 near-tie rate needs megapixels to show).  These run
only on the TPU backend, where that class of bug lives:

    JPEGQS_TEST_PLATFORM=axon python -m pytest tests/test_scale.py
"""

import numpy as np
import pytest
import jax

from jpegqs_tpu import smooth_jpeg_bytes, QsOptions
from util import make_jpeg, run_reference, coef_arrays

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="scale tests target TPU hardware-unit rounding")


@pytest.mark.parametrize("quality", [3, 6])
def test_hd_color(quality):
    data = make_jpeg(1080, 1920, "photo", seed=77, color=True, quality=80,
                     subsamp=1)
    ref = coef_arrays(run_reference(data, quality, 3))
    ours = coef_arrays(smooth_jpeg_bytes(
        data, QsOptions.from_quality(quality, 3)))
    for ci, (a, b) in enumerate(zip(ours, ref)):
        assert np.array_equal(a[0], b[0]), (
            f"comp {ci}: {(a[0] != b[0]).sum()} diffs")


def test_big_gray():
    data = make_jpeg(1440, 1456, "photo", seed=78, quality=70)
    ref = coef_arrays(run_reference(data, 3, 3))
    ours = coef_arrays(smooth_jpeg_bytes(data, QsOptions.from_quality(3, 3)))
    assert np.array_equal(ours[0][0], ref[0][0])


def test_4k_420_q6():
    """BASELINE.json config #4: q6 UPSAMPLE_UV on 4K 4:2:0 — the
    full color pipeline (JOINT + UPSAMPLE + downsample) at the scale
    where near-tie rounding rates become visible."""
    data = make_jpeg(2160, 3840, "photo", seed=79, color=True, quality=85,
                     subsamp=2)
    ref = coef_arrays(run_reference(data, 6, 3))
    ours = coef_arrays(smooth_jpeg_bytes(data, QsOptions.from_quality(6, 3)))
    for ci, (a, b) in enumerate(zip(ours, ref)):
        assert np.array_equal(a[0], b[0]), (
            f"comp {ci}: {(a[0] != b[0]).sum()} diffs")
