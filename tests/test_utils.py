"""utils/profiling + utils/cache smoke tests."""

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


def test_cache_codec_roundtrip():
    """utils/cache installs a zlib writer with a format-sniffing
    reader: zlib-written entries round-trip, and zstd entries written
    by unpatched processes stay readable in the same cache dir."""
    from jax._src import compilation_cache as cc

    # conftest already ran cache.setup(); the codec must be installed
    assert getattr(cc, "_jpegqs_zlib_codec", False)
    data = b"\x00\x01" * 50000 + b"payload"
    z = cc.compress_executable(data)
    assert z[:4] != b"\x28\xb5\x2f\xfd"      # not a zstd frame
    assert cc.decompress_executable(z) == data
    try:
        import zstandard
    except ImportError:
        return
    zf = zstandard.ZstdCompressor().compress(data)
    assert cc.decompress_executable(zf) == data
