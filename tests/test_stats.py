"""Driver accounting (skani_tpu/stats.py): per-phase wall time, pair
routing, and compile counters must be populated by a driver run —
the instrumentation behind the end-of-driver `perf[...]` log line."""
import os

from conftest import fixture_path

from skani_tpu import stats
from skani_tpu.engine import triangle
from skani_tpu.params import CommandParams, SketchParams


def test_triangle_populates_counters(tmp_path):
    stats.reset()
    base = stats.snapshot()
    cp = CommandParams(ref_files=[fixture_path("viruses.fna")],
                       individual_contig_r=True, sparse=True,
                       out_file_name=str(tmp_path / "o.tsv"))
    sp = SketchParams(c=30, marker_c=200)
    triangle(cp, sp)
    c = stats.snapshot()
    assert c.get("executor_s", 0.0) > 0.0
    assert c.get("screen_s", 0.0) > 0.0
    assert c.get("sketch_s", 0.0) > 0.0
    assert c.get("write_s", 0.0) >= 0.0
    n_pairs = (c.get("pairs_device", 0) + c.get("pairs_host", 0)
               + c.get("pairs_mirrored", 0))
    if os.environ.get("SKANI_TPU_EXECUTOR") == "tpu" \
            or "pairs_device" in c:
        # device executor: every scored pair is accounted to exactly one
        # route, and each device batch was counted
        assert n_pairs > 0
        assert c.get("device_batches", 0) >= 1
    line = stats.driver_report("triangle", 1.0, base)
    assert "executor=" in line and "pairs[" in line
    # some virus pairs scored (sparse mode flushes results to disk)
    assert len(open(cp.out_file_name).read().splitlines()) > 3


def test_timer_and_reset():
    stats.reset()
    with stats.timer("x_s"):
        pass
    assert stats.snapshot()["x_s"] >= 0.0
    stats.add("y", 2)
    stats.add("y", 3)
    assert stats.snapshot()["y"] == 5
    stats.reset()
    # phase_a_compiles is synthesized at snapshot time (compile-cache
    # size), so it survives reset; everything else clears
    assert set(stats.snapshot()) == {"phase_a_compiles"}
