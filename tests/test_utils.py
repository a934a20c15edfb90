"""utils/profiling smoke tests."""

import io

from jpegqs_tpu.utils.profiling import PhaseTimer


def test_phase_timer_report():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    with t.phase("a"):
        pass
    buf = io.StringIO()
    t.report(megapixels=1.0, blocks=1000, file=buf)
    out = buf.getvalue()
    assert "a" in out and "b" in out and "total" in out
    assert "MP/s" in out and "blocks/s" in out
