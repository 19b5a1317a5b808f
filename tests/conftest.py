"""Test configuration.

Platform notes:
- On a plain machine (driver CI) the env vars below force an 8-device
  virtual CPU platform, so sharding tests get a real mesh.
- On the axon dev box, sitecustomize imports jax and pins the tunneled TPU
  *before* pytest starts, so the env vars are inert: tests then run on the
  single real TPU chip. Numeric tests therefore force f32 matmul
  accumulation (TPU defaults to bf16 inputs), and multi-device tests skip
  when fewer than 8 devices are visible (the driver validates the
  multi-chip path via ``__graft_entry__.dryrun_multichip`` on a virtual CPU
  mesh instead). To run the mesh tests locally:
  ``PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/``.
"""

import os

if "jax" not in globals():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest

# HH_TEST_WATCHDOG=<seconds>: dump every thread's stack and hard-exit if a
# single test exceeds the budget. The axon TPU tunnel can die mid-run, after
# which any device call blocks forever in an uninterruptible retry loop
# (SIGINT is swallowed); without this the suite hangs silently. Use it for
# unattended TPU-pinned runs, e.g. HH_TEST_WATCHDOG=900.
_WATCHDOG = float(os.environ.get("HH_TEST_WATCHDOG", "0") or 0)
if _WATCHDOG:
    import faulthandler

    # Dump to a file, NOT stderr: by conftest-import time pytest has
    # already re-pointed fd 2 at its capture pipe, so a dump there dies
    # with the process. The trace lands in HH_TEST_WATCHDOG_LOG
    # (default /tmp/hh_test_watchdog.trace) together with the name of the
    # test that was running.
    _WD_LOG = os.environ.get("HH_TEST_WATCHDOG_LOG", "/tmp/hh_test_watchdog.trace")
    _wd_stream = open(_WD_LOG, "w", buffering=1)

    @pytest.fixture(autouse=True)
    def _hh_watchdog(request):
        _wd_stream.seek(0)
        _wd_stream.truncate()
        _wd_stream.write(f"armed for: {request.node.nodeid}\n")
        _wd_stream.flush()
        faulthandler.dump_traceback_later(_WATCHDOG, exit=True, file=_wd_stream)
        yield
        faulthandler.cancel_dump_traceback_later()


_HH_COV = os.environ.get("HH_COV")
if _HH_COV:
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import _hhcov

    _hhcov.start()

    def pytest_sessionfinish(session, exitstatus):
        _hhcov.stop_and_dump(_HH_COV)


def require_devices(n):
    return pytest.mark.skipif(
        len(jax.devices()) < n,
        reason=f"needs {n} devices (run with JAX_PLATFORMS=cpu "
        f"XLA_FLAGS=--xla_force_host_platform_device_count={n})",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
