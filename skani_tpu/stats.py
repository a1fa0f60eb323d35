"""Process-wide driver/engine accounting.

Answers the "where did the wall time go" question for a whole driver run
(the gap between batch-level device throughput and end-to-end driver
throughput): per-phase wall time (sketch / screen / executor / write),
pair routing (device vs host-steal vs mirrored), device batch count, and
the number of distinct phase_a XLA compilations the run triggered.

The counters are cumulative per process and cheap enough to stay always
on; drivers emit one summary log line at the end of a run (engine.py),
and `SKANI_TPU_TIMING=1` additionally prints the per-batch breakdown
(kernels/device_pipeline.py).

reference analog: skani logs coarse phase times only (src/dist.rs:180-186
"Generating sketch time"/"ANI calculation time"); the compile/routing
accounting is TPU-specific — XLA recompiles per (R, A) shape bucket, and
fresh-bucket compiles are a real end-to-end cost the reference has no
equivalent of.
"""
from __future__ import annotations

import contextlib
import threading
import time
from typing import Dict

_lock = threading.Lock()
_counters: Dict[str, float] = {}


def add(name: str, value: float = 1.0) -> None:
    with _lock:
        _counters[name] = _counters.get(name, 0.0) + value


@contextlib.contextmanager
def timer(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        add(name, time.perf_counter() - t0)


def snapshot() -> Dict[str, float]:
    """Counter snapshot, plus the current phase_a compile-cache size so
    driver_report can delta it like every other field."""
    with _lock:
        c = dict(_counters)
    c["phase_a_compiles"] = float(_phase_a_compiles())
    return c


def reset() -> None:
    with _lock:
        _counters.clear()


def _phase_a_compiles() -> int:
    """Distinct phase_a XLA compilations so far (0 if the device module
    was never imported — pure-host runs compile nothing)."""
    import sys
    mod = sys.modules.get("skani_tpu.kernels.device_pipeline")
    if mod is None:
        return 0
    try:
        return int(mod.phase_a._cache_size())
    except Exception:
        return 0


def driver_report(driver: str, wall_s: float,
                  since: Dict[str, float] | None = None) -> str:
    """One-line end-of-driver summary. Counters are process-global and
    monotonic; pass `since` (a snapshot() taken at driver entry) to
    report only this run's deltas."""
    c = snapshot()
    base = since or {}

    def g(k):
        return c.get(k, 0.0) - base.get(k, 0.0)

    phases = " ".join(
        f"{k}={g(k + '_s'):.2f}s"
        for k in ("sketch", "screen", "load", "executor", "write")
        if g(k + "_s") > 0.0)
    pairs = (f"pairs[device={int(g('pairs_device'))}"
             f" host={int(g('pairs_host'))}"
             f" mirrored={int(g('pairs_mirrored'))}]")
    dev = (f"batches={int(g('device_batches'))}"
           f" compiles={int(g('phase_a_compiles'))}"
           f" readback={g('readback_s'):.2f}s"
           f" finalize={g('finalize_s'):.2f}s")
    return (f"perf[{driver}]: wall={wall_s:.2f}s {phases} {pairs} {dev}")
