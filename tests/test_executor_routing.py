"""Executor routing under a multi-process runtime.

Non-owned reference sketches are marker-only stubs in multihost runs, so
any executor that chains pairs locally (native/numpy, or the small-batch
auto shortcut) would silently score against empty sketches.  The routing
layer must send EVERY pair batch through the cross-process fleet whenever
jax.distributed is active — regardless of batch size, backend, or a
forced SKANI_TPU_EXECUTOR choice (round-2 advisor finding, high).
"""
import os

import pytest

from skani_tpu import engine, multihost


@pytest.fixture
def fake_multihost(monkeypatch):
    monkeypatch.setattr(multihost, "is_active", lambda: True)


def _sentinel_fleet(monkeypatch):
    calls = []

    def fake_tpu_executor(*args, **kw):
        calls.append(args)
        return ["fleet"]

    import skani_tpu.kernels.pipeline as pipeline
    monkeypatch.setattr(pipeline, "tpu_pair_executor", fake_tpu_executor)
    return calls


def test_auto_routes_to_fleet_under_multihost(fake_multihost, monkeypatch):
    calls = _sentinel_fleet(monkeypatch)
    # one tiny pair on the CPU backend: the small-batch/native shortcut
    # would normally win — multihost must override it
    out = engine._auto_pair_executor([], [], [(0, 0)], None, None, None)
    assert out == ["fleet"]
    assert len(calls) == 1


@pytest.mark.parametrize("choice", ["native", "numpy"])
def test_forced_host_executor_ignored_under_multihost(
        fake_multihost, monkeypatch, choice):
    calls = _sentinel_fleet(monkeypatch)
    monkeypatch.setitem(os.environ, "SKANI_TPU_EXECUTOR", choice)
    ex = engine.get_pair_executor()
    out = ex([], [], [(0, 0)], None, None, None)
    assert out == ["fleet"]
    assert len(calls) == 1


def test_forced_host_executor_honored_single_process(monkeypatch):
    monkeypatch.setattr(multihost, "is_active", lambda: False)
    monkeypatch.setitem(os.environ, "SKANI_TPU_EXECUTOR", "native")
    ex = engine.get_pair_executor()
    assert ex is engine._default_pair_executor
