"""Multi-host execution: 2 real processes x 4 CPU devices each,
bit-identical to the single-process engine (BASELINE.json config #5's
"N>=2 hosts" requirement, SURVEY.md §5 distributed backend).

Runs the tools/run_multihost.py launcher in --local fan-out mode so a
genuine jax.distributed job (coordination service, cross-process
collectives) is exercised without TPU hardware.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from util import REPO, make_jpeg, coef_arrays

LAUNCHER = os.path.join(REPO, "tools", "run_multihost.py")


@pytest.mark.slow
@pytest.mark.parametrize("color,quality", [(False, 3), (True, 5)])
def test_two_process_matches_single(tmp_path, color, quality):
    data = make_jpeg(128, 96, "photo", seed=31, color=color, quality=70)
    inp = tmp_path / "in.jpg"
    inp.write_bytes(data)
    out = tmp_path / "out.jpg"

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)      # launcher sets cpu per process
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, LAUNCHER, "--local", "2",
         "--devices-per-host", "4", "-q", str(quality), "-n", "2",
         str(inp), str(out)],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()

    # single-process engine result
    from jpegqs_tpu import engine
    from jpegqs_tpu.host import jpegio
    from jpegqs_tpu.options import QsOptions
    img = jpegio.read_coefficients(data)
    want = engine._smooth_fused(img, QsOptions.from_quality(quality, 2))

    got = coef_arrays(out.read_bytes())
    for ci, (coefs, _q) in enumerate(got):
        ref = (want.upsampled[ci - 1] if want.upsampled is not None
               and ci >= 1 else want.coefs[ci])
        assert np.array_equal(coefs, ref), f"comp {ci}"
