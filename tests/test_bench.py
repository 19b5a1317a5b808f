"""Wedge-proofing tests for the driver entry points (VERDICT r3 item 1).

Round 3 lost both driver-captured artifacts (BENCH_r03 / MULTICHIP_r03,
both rc=124) because a dead axon tunnel blocks ANY in-process device call
forever. These tests pin the contract: bench.py and
__graft_entry__.dryrun_multichip must produce a structured result without
ever binding an accelerator backend in the calling process.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_probe_devices_timeout_returns_none():
    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.remove(REPO)
    # 50 ms is not enough to even exec the probe interpreter -> None,
    # exercising the TimeoutExpired branch a dead tunnel hits.
    assert bench._probe_devices(timeout=0.05) is None


def test_bench_dead_backend_prints_structured_line_and_exits_zero():
    env = dict(os.environ)
    env["HH_BENCH_PROBE_TIMEOUT"] = "0.05"  # guarantees probe failure
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=120,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr
    last = json.loads(proc.stdout.strip().splitlines()[-1])
    assert last["metric"] == "tpu_unavailable"
    assert last["value"] == 0.0


def test_watchdog_predicate_requires_deadline_and_stall():
    """The mid-run watchdog fires only on deadline AND silence: a healthy
    run that keeps completing stages past the deadline is left alone, and
    early silence (one long cold compile) is tolerated before the
    deadline."""
    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.remove(REPO)
    fire = bench._watchdog_should_fire
    # before the deadline: never fires, however long the silence
    assert not fire(now=100.0, t0=0.0, last_progress=0.0, deadline=200.0, stall=50.0)
    # past the deadline but a stage completed recently: keep waiting
    assert not fire(now=300.0, t0=0.0, last_progress=290.0, deadline=200.0, stall=50.0)
    # past the deadline and silent past the stall window: fire
    assert fire(now=300.0, t0=0.0, last_progress=200.0, deadline=200.0, stall=50.0)


def test_dryrun_never_probes_accelerator_in_process(monkeypatch):
    """With any non-cpu JAX_PLATFORMS, dryrun_multichip must go straight to
    the CPU subprocess — no jax.devices() call in-process (it can hang)."""
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)

    calls = {}

    def fake_run(cmd, **kw):
        calls["cmd"] = cmd
        calls["env"] = kw["env"]
        calls["timeout"] = kw.get("timeout")

        class R:
            returncode = 0
            stdout = "dryrun_multichip OK (fake)\n"
            stderr = ""

        return R()

    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr(subprocess, "run", fake_run)
    g.dryrun_multichip(8)
    assert calls["env"]["JAX_PLATFORMS"] == "cpu"
    assert calls["env"]["PALLAS_AXON_POOL_IPS"] == ""
    assert "--xla_force_host_platform_device_count=8" in calls["env"]["XLA_FLAGS"]
    assert calls["timeout"] is not None  # bounded — never an indefinite hang


def test_dryrun_subprocess_timeout_raises_structured_error(monkeypatch):
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)

    def fake_run(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 0), output="partial\n")

    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr(subprocess, "run", fake_run)
    import pytest

    with pytest.raises(RuntimeError, match="exceeded"):
        g.dryrun_multichip(8)
