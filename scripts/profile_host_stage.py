#!/usr/bin/env python3
"""Profile the device engine's HOST stage (readback post-processing).

The per-batch host work — unpack, overlap resolution, rank queries,
estimator tail, finalize, GBDT — runs on one core and serializes with
device dispatch, so its ms/pair bounds end-to-end throughput no matter how
fast phase A gets.  This script captures one phase_a readback at bench
shapes and times the host stage in isolation (any backend; the host code
is backend-independent).

Usage: [JAX_PLATFORMS=cpu] python scripts/profile_host_stage.py [n_genomes]
"""
import cProfile
import io
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench
from skani_tpu import CommandParams
from skani_tpu.kernels.device_pipeline import DevicePairEngine


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    genomes = bench.make_genomes(n)
    sketches, params = bench.sketch_genomes(genomes)
    pairs = [(i, j) for i in range(n) for j in range(n) if i < j]
    eng = DevicePairEngine(sketches, params, CommandParams())

    # build one batch's inputs exactly as run_pairs does
    from skani_tpu.params import map_params_from_sketch
    from skani_tpu.chain import compute_switch
    from skani_tpu.gbdt import get_model
    model = get_model(params.c, True)
    meta = []
    for t, (ri, qi) in enumerate(pairs):
        ref = sketches[ri]
        mp = map_params_from_sketch(ref, False, CommandParams(), model)
        sw = compute_switch(ref, sketches[qi])
        meta.append((t, ri if sw else qi, qi if sw else ri, sw, mp,
                     ri, qi, eng._bucket_a(ri, qi)))
    meta.sort(key=lambda m: m[7])
    group = meta[:eng._r_for(meta[0][7])]

    t0 = time.perf_counter()
    ph, icap, ccap = eng._dispatch_phase_a(group, group[0][4])
    packed = np.asarray(ph)
    print(f"# phase_a + readback (cold): "
          f"{1e3 * (time.perf_counter() - t0):.0f} ms, "
          f"group={len(group)} pairs, packed {packed.shape} "
          f"({packed.nbytes >> 10} KiB)")

    def host_py():
        out = [None] * len(pairs)
        batch_recs, ranks = eng._host_process(group, packed, icap, ccap)
        eng._finalize_batch(group, batch_recs, ranks, out)
        return out

    def host_native():
        out = [None] * len(pairs)
        if not eng._process_batch_native(group, packed, out, icap, ccap):
            raise RuntimeError("native finalize unavailable")
        return out

    host_py()       # warm caches (rank tables etc.)
    host_native()
    reps = 10
    for name, fn in (("python", host_py), ("native", host_native)):
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        dt = (time.perf_counter() - t0) / reps
        print(f"# host stage [{name}]: {1e3 * dt:.1f} ms/batch, "
              f"{1e3 * dt / len(group):.2f} ms/pair")

    # exactness: the two paths must agree bit for bit
    a_res, b_res = host_py(), host_native()
    bad = 0
    for a, b in zip(a_res, b_res):
        if a is None and b is None:
            continue
        for f in ("ani", "align_fraction_query", "align_fraction_ref",
                  "ci_lower", "ci_upper", "std", "avg_chain_int_len",
                  "total_bases_covered", "quant_90_contig_len_q"):
            x, y = getattr(a, f), getattr(b, f)
            if isinstance(x, float) and np.isnan(x) and np.isnan(y):
                continue
            if x != y:
                print(f"MISMATCH {f}: {x} != {y} "
                      f"({a.ref_file} vs {a.query_file})")
                bad += 1
    print(f"# exactness: {'OK' if not bad else f'{bad} MISMATCHES'}")

    prof = cProfile.Profile()
    prof.enable()
    for _ in range(5):
        host_native()
    prof.disable()
    s = io.StringIO()
    pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(20)
    print(s.getvalue())


if __name__ == "__main__":
    main()
