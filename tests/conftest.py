"""Test configuration: run JAX locally on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on CPU (SURVEY.md §4.4); the real-TPU
bench path is exercised separately by bench.py.

The ambient environment may register a TPU PJRT plugin into every Python
process via a PYTHONPATH sitecustomize and force jax_platforms to the tunneled
TPU backend, which routes every tiny test op over the network (~25x slower)
and hangs ~60s at interpreter exit. Neutralize it: force the platform config
back to CPU, drop any initialized backends, and skip interpreter teardown.
"""

import os
import sys

_PLATFORM = os.environ.get("MEDIA_TPU_TEST_PLATFORM", "cpu")

os.environ["JAX_PLATFORMS"] = _PLATFORM
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Key the persistent cache by host CPU features: XLA:CPU AOT entries
# compiled on a different machine type load with a warning and can SIGSEGV
# at dispatch (observed: suite crash in backend_compile_and_load after a
# round ran on a different host); a per-machine directory sidesteps it.
def _machine_cache_dir(base="/tmp/media_tpu_jax_cache"):
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        flags = ""
    return f"{base}_{hashlib.md5(flags.encode()).hexdigest()[:8]}"


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _machine_cache_dir())
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

if "jax" in sys.modules:  # a sitecustomize already imported + configured jax
    import jax

    jax.config.update("jax_platforms", _PLATFORM)
    try:
        from jax.extend.backend import clear_backends

        clear_backends()
    except Exception:
        pass

import pytest


_TESTS_SINCE_CLEAR = [0]


@pytest.fixture(autouse=True)
def _clear_jax_caches_periodically():
    """Drop compiled executables every few tests and at module boundaries.

    The suite compiles hundreds of XLA CPU programs; keeping them loaded in
    one process crashes the compiler (SIGSEGV inside
    backend_compile_and_load — originally after ~150 tests, now earlier as
    the per-module compile count grew). The persistent compilation cache
    (conftest header) keeps the recompiles cheap."""
    yield
    _TESTS_SINCE_CLEAR[0] += 1
    if _TESTS_SINCE_CLEAR[0] >= 10:
        _TESTS_SINCE_CLEAR[0] = 0
        try:
            import jax

            jax.clear_caches()
        except Exception:
            pass


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    try:
        import jax

        jax.clear_caches()
        _TESTS_SINCE_CLEAR[0] = 0
    except Exception:
        pass


_exit_status = [0]


def pytest_sessionfinish(session, exitstatus):
    _exit_status[0] = int(exitstatus)


def pytest_unconfigure(config):
    # If a TPU PJRT plugin was registered, its atexit teardown can hang ~60s;
    # all test output is flushed by now, so skip interpreter teardown.
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(_exit_status[0])
