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


def test_analytic_flops_counter_pins_known_figures():
    """utils/flops.py counters vs the established BENCH_NOTES.md roofline
    figure (~3.3 TFLOP flagship 16f eval fwd) and bench.py's constant."""
    from helping_hand_for_egocentric_videos_tpu.models import DecoderConfig
    from helping_hand_for_egocentric_videos_tpu.models.lavila import (
        timesformer_large_config,
    )
    from helping_hand_for_egocentric_videos_tpu.utils.flops import (
        eval_fwd_flops_per_clip,
        train_step_flops_per_clip,
        vision_fwd_flops,
    )

    cfg16 = timesformer_large_config(num_frames=16)
    dec16 = DecoderConfig(num_frames=16, pred_traj=False)
    ev = eval_fwd_flops_per_clip(cfg16, dec16)
    assert abs(ev - 3.458e12) / 3.458e12 < 0.01  # bench.py FLOPS_PER_CLIP_16F
    assert abs(ev - 3.3e12) / 3.3e12 < 0.06  # BENCH_NOTES hand figure, <6% off

    cfg4 = timesformer_large_config(num_frames=4)
    tr = train_step_flops_per_clip(cfg4, DecoderConfig(num_frames=4))
    # frozen fwd dominates; fwd-only backbone => train/clip < eval-16f/4 * 1.3
    assert 0.8e12 < tr < 1.1e12
    # 16f vision is ~4x the 4f vision plus the quadratic temporal-attn term
    assert vision_fwd_flops(cfg16.visual) > 3.9 * vision_fwd_flops(cfg4.visual)
