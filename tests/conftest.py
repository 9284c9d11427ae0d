"""Test-session bootstrap.

The sandbox's sitecustomize eagerly registers the axon TPU backend for every
python process (PYTHONPATH=/root/.axon_site) and forces JAX_PLATFORMS=axon,
so by the time conftest runs the backend choice is already made. The test
suite must run on the CPU backend with 8 virtual devices (SURVEY.md section
4.5 — multi-device tests fake an 8-chip mesh via
--xla_force_host_platform_device_count), so when we detect the axon env we
re-exec pytest once with a clean CPU environment.

The re-exec happens inside pytest_configure with global capture stopped:
pytest redirects fd 1/2 before conftests load, and an exec'd child would
otherwise inherit the captured fds and appear silent.

Set NBX_TEST_TPU=1 to skip the re-exec and run the suite on the real chip.
"""

import os
import sys

def _axon_site_active() -> bool:
    """True when the axon sitecustomize dir is still importable — it forces
    JAX_PLATFORMS=axon at interpreter start, overriding any cpu request, so
    JAX_PLATFORMS=cpu alone is NOT sufficient to skip the re-exec."""
    return any("axon" in p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep))


_NEED_REEXEC = (
    os.environ.get("_NBX_REEXECED") != "1"
    and os.environ.get("NBX_TEST_TPU") != "1"
    and (os.environ.get("JAX_PLATFORMS", "") != "cpu" or _axon_site_active())
)

if not _NEED_REEXEC:
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    if not _NEED_REEXEC:
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["_NBX_REEXECED"] = "1"
    env["PYTHONPATH"] = repo_root
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    # Unbuffered stdout: with a piped stdout + capture, a runtime thread can
    # hold the buffered-writer lock at interpreter shutdown ("Fatal Python
    # error: _enter_buffered_busy") after multi-device CPU tests.
    env["PYTHONUNBUFFERED"] = "1"
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        env,
    )


import pytest  # noqa: E402


def _n_maps() -> int:
    """Current VMA count of this process (Linux); 0 where unreadable."""
    try:
        with open("/proc/self/maps", "rb") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


@pytest.fixture(autouse=True)
def _map_count_guard():
    """Drop jit caches when the process nears the kernel's vm.max_map_count.

    Every XLA:CPU executable the suite compiles stays alive in jax's
    in-process caches, and each holds JIT code pages + guard mappings: the
    full suite accumulates ~65k VMAs and the kernel's default
    vm.max_map_count=65530 then makes LLVM's next mmap fail — measured as a
    hard SIGSEGV inside pjit compile at the suite's largest compile
    (tests/test_spatial.py, ~test 200), 3/3 deterministic, while any subset
    of the suite passes. Clearing caches frees the executables and their
    mappings; the threshold keeps the (expensive) recompiles rare — it
    triggers ~once per full run, never in module-sized runs."""
    if _n_maps() > 45_000:
        import jax

        jax.clear_caches()
    yield


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return jax.devices()[:8]
