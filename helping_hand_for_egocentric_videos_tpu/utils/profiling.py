"""Profiling helpers: jax trace capture + op-level summaries.

Replaces the reference's wall-clock-only instrumentation
(run/train.py:204-219, utils/tensorboard_utils.py GPU polling) with real
device profiles: ``trace`` context-manages a jax profiler capture, and
``top_ops`` parses the captured xplane with the installed xprof converter
into a (self-time, op-type) table — usable headless, no TensorBoard UI.
"""

from __future__ import annotations

import contextlib
import glob
import os
import time

__all__ = ["trace", "top_ops", "StepTimer"]


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def top_ops(log_dir: str, k: int = 15):
    """Returns [(self_time_ms, host_or_device, op_type), ...] descending.

    Requires the xprof tensorboard plugin (present in the TPU image); the
    protobuf runtime needs PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python
    with mismatched generated code — set automatically here.
    """
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    import json

    from xprof.convert import raw_to_tool_data as rtd

    files = sorted(glob.glob(os.path.join(log_dir, "plugins/profile/*/*.xplane.pb")))
    if not files:
        raise FileNotFoundError(f"no xplane captures under {log_dir}")
    data, _ = rtd.xspace_to_tool_data([files[-1]], "framework_op_stats^", {})
    d = json.loads(data)
    tab = d[0] if isinstance(d, list) else d
    rows = tab["rows"]

    def val(r, i):
        return r["c"][i].get("v")

    out = []
    for r in sorted(rows, key=lambda r: -(val(r, 7) or 0))[:k]:
        out.append((round((val(r, 7) or 0) / 1000, 2), val(r, 1), val(r, 2)))
    return out


class StepTimer:
    """Steps-per-second meter with warmup skip (device/sps parity,
    run/train.py:219)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.start = None

    def tick(self):
        self.count += 1
        if self.count == self.warmup:
            self.start = time.perf_counter()

    @property
    def steps_per_sec(self) -> float:
        if self.start is None or self.count <= self.warmup:
            return 0.0
        return (self.count - self.warmup) / (time.perf_counter() - self.start)
