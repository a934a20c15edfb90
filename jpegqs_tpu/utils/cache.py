"""Persistent-compile-cache setup shared by tests, bench and tools.

Two hardening measures over plain ``jax_compilation_cache_dir``:

1. **Per-machine cache subdirectory.**  jax's CPU cache key does NOT
   include the compile machine's CPU features; loading an executable
   AOT-compiled on a different host prints
   ``cpu_aot_loader: Machine type ... doesn't match`` warnings and,
   after ~175 such loads in one process, the next large
   deserialize/compress SEGFAULTS (measured: full-suite runs died at
   item 176 regardless of which tests ran, always under
   compilation_cache.py get/put).  Dev sessions here rotate between
   hosts, so the cache directory is suffixed with a fingerprint of
   /proc/cpuinfo flags — a new machine starts a fresh cache instead of
   deserializing another machine's code.

2. **zlib entry codec.**  jax's default zstandard writer also crashed
   sporadically serializing the very large interpret-mode sharded
   programs.  New entries are written with stdlib ``zlib`` (level 1 —
   write-once read-many; speed over ratio) and the format magic is
   sniffed on read, so zstd entries written by unpatched processes on
   the same machine stay valid.
"""

import hashlib
import os
import zlib

_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"


def raise_stack_limit() -> None:
    """Raise the main-thread stack soft limit (hard limit permitting).

    XLA's executable (de)serialization recurses deeply on the very
    large interpret-mode sharded programs; under a long test-suite
    process (deep pytest + tracing stacks already in place) the
    default 8 MB soft limit has produced hard SIGSEGVs inside
    ``executable.serialize()`` at cache-write time (observed round 5,
    tests/test_sharded.py under the full suite; standalone the same
    test passes).  The Linux main-thread stack grows on demand up to
    the *current* soft limit, so raising it at runtime is effective."""
    try:
        import resource
        soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
        want = 512 * 1024 * 1024
        if hard != resource.RLIM_INFINITY:
            want = min(want, hard)
        if soft != resource.RLIM_INFINITY and soft < want:
            resource.setrlimit(resource.RLIMIT_STACK, (want, hard))
    except (ImportError, ValueError, OSError):
        pass


def machine_fingerprint() -> str:
    """Stable 8-hex-char fingerprint of this host's CPU feature set."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.md5(flags.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform
    return hashlib.md5(platform.processor().encode()).hexdigest()[:8]


def setup(cache_dir: str) -> None:
    """Point jax's persistent compilation cache at the per-machine
    subdirectory of ``cache_dir`` and install the zlib-write /
    format-sniffing-read codec."""
    import jax
    from jax._src import compilation_cache as cc

    raise_stack_limit()
    sub = os.path.join(cache_dir, machine_fingerprint())
    os.makedirs(sub, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", sub)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    if getattr(cc, "_jpegqs_zlib_codec", False):
        return
    zstandard_mod = getattr(cc, "zstandard", None)
    # jax prefers the 'zstd' module over 'zstandard' when both exist;
    # entries written by an unpatched process may be zstd frames even
    # on an env where 'zstandard' is absent.
    zstd_mod = getattr(cc, "zstd", None)

    log_path = os.environ.get("JPEGQS_CACHE_LOG")
    stats = {"n": 0, "bytes": 0}

    def _log_load(n_bytes: int) -> None:
        stats["n"] += 1
        stats["bytes"] += n_bytes
        if log_path:
            with open(log_path, "a") as f:
                f.write(f"{stats['n']} {n_bytes} {stats['bytes']}\n")

    def compress_executable(data: bytes) -> bytes:
        return zlib.compress(data, 1)

    def decompress_executable(data: bytes) -> bytes:
        if data[:4] == _ZSTD_MAGIC:
            if zstandard_mod is not None:
                out = zstandard_mod.ZstdDecompressor().decompress(data)
            elif zstd_mod is not None:
                out = zstd_mod.decompress(data)
            else:
                out = zlib.decompress(data)
        else:
            out = zlib.decompress(data)
        _log_load(len(out))
        return out

    cc.compress_executable = compress_executable
    cc.decompress_executable = decompress_executable
    cc._jpegqs_zlib_codec = True
