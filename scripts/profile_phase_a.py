#!/usr/bin/env python3
"""Stage-by-stage wall profile of phase_a on the live accelerator.

Times cumulative prefixes of the phase-A graph (see `stage` checkpoints in
kernels/device_pipeline.py) via result READBACK — on the axon tunnel,
block_until_ready is a no-op, so transfer-to-host is the only reliable
fence.  Stage deltas give the incremental cost of each pipeline block.

Usage: python scripts/profile_phase_a.py [reps]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import bench  # noqa: E402  (reuses the bench workload)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from skani_tpu import CommandParams, map_params_from_sketch  # noqa: E402
from skani_tpu.kernels.device_pipeline import (DevicePairEngine,  # noqa: E402
                                               phase_a)

STAGE_NAMES = {
    1: "join (searchsorted + hit gathers)",
    31: "+ expansion fill scatter",
    32: "+ forward-fill / rank / brow",
    33: "+ query-side (apk) gather",
    34: "+ ref-side (bpk) gather",
    3: "+ anchor expansion (fill + pos gathers)",
    4: "+ anchor 5-key sort",
    5: "+ closed-form chunking",
    6: "+ DP inputs (regroup scatters / compact packing)",
    7: "+ chaining DP",
    8: "+ extraction (padded->compact gather; no-op compact)",
    9: "+ chain aggregation scatter",
    10: "+ root-column compaction sort",
    11: "+ per-chain field gathers",
    99: "full (compaction + pack)",
}


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    genomes = bench.make_genomes(int(os.environ.get("BENCH_GENOMES", "14")))
    sketches, params = bench.sketch_genomes(genomes)
    cp = CommandParams()
    eng = DevicePairEngine(sketches, params, cp)
    mp = map_params_from_sketch(sketches[0], False, cp, None)
    dev = jax.devices()[0]
    print(f"device={dev}  R={eng.R} A={eng.A} K={eng.db.K} P={eng.db.P} "
          f"C_CAP={eng.C_CAP} L_CAP={eng.L_CAP} band={mp.index_chain_band} "
          f"mode={eng.gen_mode} join={eng.join_mode} "
          f"compact_dp={DevicePairEngine._compact_dp(dev)}", flush=True)

    n = len(sketches)
    a_idx = np.arange(eng.R, dtype=np.int32) % n
    b_idx = (np.arange(eng.R, dtype=np.int32) + 1) % n
    put = lambda x: jax.device_put(jnp.asarray(x), dev)
    args = (eng.db.arrays, put(np.stack([a_idx, b_idx])))
    kw = dict(A=eng.A, I_CAP=eng.I_CAP, C_CAP=eng.C_CAP, L_CAP=eng.L_CAP,
              band=mp.index_chain_band, fl=mp.fragment_length,
              pcl=min(mp.fragment_length // 2, mp.bp_chain_band),
              max_gap=mp.max_gap_length, anchor_score=mp.anchor_score,
              min_anchors=mp.min_anchors, min_score=mp.min_score,
              use_pallas=dev.platform == "tpu", gen_mode=eng.gen_mode,
              join_mode=eng.join_mode,
              fused_regroup=os.environ.get(
                  "SKANI_TPU_FUSED_REGROUP", "0") == "1",
              compact_dp=DevicePairEngine._compact_dp(dev),
              compact_wide=eng._compact_wide_ok)

    sel = os.environ.get("PROFILE_STAGES")
    stages = ([int(x) for x in sel.split(",")] if sel
              else sorted(STAGE_NAMES))
    prev = 0.0
    for stage in stages:
        # warmup/compile
        out = phase_a(*args, stage=stage, **kw)
        jax.tree_util.tree_map(np.asarray, out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = phase_a(*args, stage=stage, **kw)
            jax.tree_util.tree_map(np.asarray, out)
            best = min(best, time.perf_counter() - t0)
        print(f"stage {stage:2d} {STAGE_NAMES[stage]:42s} "
              f"{best * 1e3:8.1f} ms  (+{(best - prev) * 1e3:7.1f} ms)",
              flush=True)
        prev = best

    # empty roundtrip floor
    tiny = jax.jit(lambda x: x + 1)
    t = put(np.zeros(8, np.int32))
    np.asarray(tiny(t))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(tiny(t))
        best = min(best, time.perf_counter() - t0)
    print(f"sync floor (tiny jit + readback)              "
          f"{best * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
