"""Tracing / profiling — the debug-trace + scope-analyzer analog
(SURVEY §5a/§5c).

The reference has three observation layers: --debug=N logs with per-
instruction UUIDs (sim/simx/debug.h, emulator.cpp:191-197), MPM perf
counters, and the FPGA scope analyzer capturing signal windows to VCD
(runtime/common/scope.cpp).  Under XLA those map to:

  * stage(name): jax.named_scope + host wall-clock accounting — stage
    names appear in HLO and in xprof traces, the UUID-tagged-event analog
  * profile(logdir): jax.profiler capture window — the scope-analyzer
    analog (open the trace in XProf/TensorBoard instead of a VCD viewer)
  * trace_log(level, ...): leveled stderr logging gated by
    SKYBOX_DEBUG=N, the --debug=N analog
"""
from __future__ import annotations

import collections
import contextlib
import os
import sys
import time

import jax

_stage_ms: collections.Counter = collections.Counter()
_stage_calls: collections.Counter = collections.Counter()

DEBUG_LEVEL = int(os.environ.get("SKYBOX_DEBUG", "0"))


@contextlib.contextmanager
def stage(name: str, sync: bool = False):
    """Named pipeline stage: shows up in HLO/xprof and accumulates host
    wall time.  sync=True blocks on dispatched work for accurate timing
    (costs pipelining — keep False in production paths)."""
    t0 = time.perf_counter()
    with jax.named_scope(name):
        yield
    if sync:
        try:
            jax.effects_barrier()
        except Exception:
            pass
    dt = (time.perf_counter() - t0) * 1e3
    _stage_ms[name] += dt
    _stage_calls[name] += 1
    trace_log(2, f"stage {name}: {dt:.3f} ms")


def stage_report() -> dict:
    """Per-stage accumulated host time (the vx_dump_perf table analog)."""
    return {
        name: {"ms": _stage_ms[name], "calls": _stage_calls[name]}
        for name in sorted(_stage_ms)
    }


def reset_stages():
    _stage_ms.clear()
    _stage_calls.clear()


@contextlib.contextmanager
def profile(logdir: str):
    """Capture an xprof trace window (scope-analyzer analog).  View with
    tensorboard --logdir=<logdir> or xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def trace_log(level: int, msg: str, file=None):
    """Leveled debug logging (the DT/DP macro analog, --debug=N)."""
    if DEBUG_LEVEL >= level:
        print(f"[skybox:{level}] {msg}", file=file or sys.stderr)
