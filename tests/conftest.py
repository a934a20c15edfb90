"""Test configuration.

JAX tests run on the CPU backend with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4.3).
Environment must be set before the first jax import.
"""

import os
import sys

# Force the CPU backend (overriding the session's TPU tunnel) unless
# the caller explicitly selects one with JPEGQS_TEST_PLATFORM — e.g.
# `JPEGQS_TEST_PLATFORM=axon pytest tests/test_engine.py` runs the
# differential suite on the real TPU chip (sharded tests then skip).
os.environ["JAX_PLATFORMS"] = os.environ.get("JPEGQS_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Persistent compilation cache: engine configs compile once per machine.
import jax  # noqa: E402

# The axon site hook forces JAX_PLATFORMS=axon at interpreter startup;
# the config update below actually takes effect.
jax.config.update("jax_platforms",
                  os.environ.get("JPEGQS_TEST_PLATFORM", "cpu"))

# Cache dir + the zlib-write codec (jax's zstandard writer segfaults
# sporadically on the giant interpret-mode programs — see
# jpegqs_tpu/utils/cache.py and CLAUDE.md).
from jpegqs_tpu.utils import cache as _qs_cache  # noqa: E402

_qs_cache.setup(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache"))


# Periodically drop jax's in-process executable caches.  A fully warm
# persistent cache means a full-suite process deserializes hundreds of
# AOT executables and keeps them all live; past a threshold the next
# sizeable (de)serialize SEGFAULTS inside XLA:CPU (the documented
# cache-crash class — observed round 5 at the same test with the crash
# in executable.serialize() on one run and deserialize_executable on
# the next, while the same test standalone passes both ways).  Clearing
# every N tests bounds the live set; reloads from the persistent cache
# are cheap (no LLVM).  Tune/disable with JPEGQS_CLEAR_EVERY (0=off).
_CLEAR_EVERY = int(os.environ.get("JPEGQS_CLEAR_EVERY", "40"))
_test_count = [0]


def pytest_runtest_teardown(item, nextitem):
    _test_count[0] += 1
    if _CLEAR_EVERY and _test_count[0] % _CLEAR_EVERY == 0:
        import gc
        jax.clear_caches()
        gc.collect()
