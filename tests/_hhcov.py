"""Dependency-free line coverage for the framework package (PEP 669).

Enabled by ``HH_COV=/path/to/out.json`` in the environment (see
``tests/conftest.py``). Uses ``sys.monitoring`` LINE events and disables
each (code, line) location after its first hit, so steady-state overhead
is near zero. At session end writes JSON::

    {rel_path: {"executed": [...], "executable": [...]}, ...}

where ``executable`` is derived from ``co_lines()`` of the compiled
source (the same notion the stdlib tracers use). Docstrings/constants at
module top level count as executable; treat small gaps as noise — the
point is finding whole functions/branches that never run.

Tooling only: not part of the shipped framework, not a reference port.
"""

from __future__ import annotations

import json
import os
import sys

_PKG_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "helping_hand_for_egocentric_videos_tpu")
)
_executed: dict[str, set[int]] = {}


def _on_line(code, line):  # pragma: no cover - the collector itself
    fn = code.co_filename
    if fn.startswith(_PKG_DIR):
        _executed.setdefault(fn, set()).add(line)
    return sys.monitoring.DISABLE


def start() -> None:
    mon = sys.monitoring
    mon.use_tool_id(mon.COVERAGE_ID, "hhcov")
    mon.register_callback(mon.COVERAGE_ID, mon.events.LINE, _on_line)
    mon.set_events(mon.COVERAGE_ID, mon.events.LINE)


def _executable_lines(path: str) -> list[int]:
    with open(path, "r", encoding="utf-8") as f:
        src = f.read()
    lines: set[int] = set()
    stack = [compile(src, path, "exec")]
    while stack:
        co = stack.pop()
        for _, _, ln in co.co_lines():
            if ln is not None:
                lines.add(ln)
        for const in co.co_consts:
            if isinstance(const, type(co)):
                stack.append(const)
    return sorted(lines)


def stop_and_dump(out_path: str) -> None:
    mon = sys.monitoring
    mon.set_events(mon.COVERAGE_ID, 0)
    mon.free_tool_id(mon.COVERAGE_ID)
    report: dict[str, dict[str, list[int]]] = {}
    for root, _, files in os.walk(_PKG_DIR):
        for name in files:
            if not name.endswith(".py"):
                continue
            path = os.path.join(root, name)
            rel = os.path.relpath(path, os.path.dirname(_PKG_DIR))
            try:
                executable = _executable_lines(path)
            except SyntaxError:
                continue
            hit = sorted(_executed.get(path, ()))
            report[rel] = {"executed": hit, "executable": executable}
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(report, f)
