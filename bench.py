#!/usr/bin/env python3
"""skani-tpu benchmark: genome-pairs/s on an all-to-all triangle workload.

Workload: N synthetic E. coli-derived genomes (point-mutated at 0.3-2% from
test_files/e.coli-W.fasta.gz, fixed seed), sketched at default c=125/k=15,
then all UNIQUE unordered pairs (i < j, the `triangle` workload) scored
through the engine's best path.  Unique pairs are the honest accounting:
the engine computes mirrored orientations by field-swapping one result, so
ordered-pair rates would credit a symmetry trick the reference's triangle
driver (reference: src/triangle.rs:71-105) gets for free too.

Baseline: the single-thread reference-equivalent path — our native C++
per-pair pipeline, which implements the reference algorithm exactly
(skani v0.3 is a single-binary Rust CLI; its published throughput claims are
qualitative, and no Rust toolchain exists in this image, so the native path
serves as the measured single-thread skani-equivalent).  vs_baseline is
best-path throughput over that single-thread baseline.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import os
import sys
import time

import numpy as np

# pair throughput is the metric; keep sketching (prep) on the host kernel
# regardless of the link-speed probe
os.environ.setdefault("SKANI_TPU_SEEDER", "native")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from skani_tpu import (CommandParams, SketchParams, map_params_from_sketch)
from skani_tpu.sketch import Sketch, default_seeder, _finalize_sketch
from skani_tpu import fastx

SOURCE = "/root/reference/test_files/e.coli-W.fasta.gz"
# 20 genomes -> 190 unique pairs: enough batches for the pipelined
# steady state to dominate edge effects at production batch sizes
N_GENOMES = int(os.environ.get("BENCH_GENOMES", "20"))
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def make_genomes(n):
    _name, seq = next(iter(fastx.iter_fastx(SOURCE)))
    rng = np.random.default_rng(7)
    genomes = []
    for i in range(n):
        rate = 0.003 + 0.017 * (i / max(n - 1, 1))
        s = seq.copy()
        nmut = int(len(s) * rate)
        posn = rng.choice(len(s), size=nmut, replace=False)
        s[posn] = BASES[rng.integers(0, 4, size=nmut)]
        genomes.append((f"mut_{i}", s))
    return genomes


def sketch_genomes(genomes):
    params = SketchParams()
    seeder = default_seeder()
    out = []
    for name, seq in genomes:
        sk = Sketch(file_name=name, marker_c=params.c, c=params.c,
                    k=params.k)
        sk.contigs = [name]
        sk.contig_lengths = np.array([len(seq)], dtype=np.uint32)
        sk.total_sequence_length = len(seq)
        km, po, ca, ma = seeder(seq, params)
        _finalize_sketch(sk, [km], [po], [ca],
                         [np.zeros(len(km), dtype=np.uint32)], [ma])
        out.append(sk)
    return out, params


def run_pairs_native(sketches, params, pairs):
    from skani_tpu.ani import chain_seeds_native
    cp = CommandParams()
    res = []
    for i, j in pairs:
        mp = map_params_from_sketch(sketches[i], False, cp, None)
        res.append(chain_seeds_native(sketches[i], sketches[j], mp))
    return res


_ENGINE = {}


def run_pairs_device(sketches, params, pairs, host_workers=None):
    """Device pipeline (engine cached across reps, like the CLI path)."""
    from skani_tpu.kernels.device_pipeline import DevicePairEngine
    eng = _ENGINE.get("eng")
    if eng is None or len(eng.sketches) != len(sketches) \
            or any(a is not b for a, b in zip(eng.sketches, sketches)):
        eng = DevicePairEngine(sketches, params, CommandParams())
        _ENGINE["eng"] = eng
    return eng.run_pairs(pairs, host_workers=host_workers)


def run_pairs_best(sketches, params, pairs):
    """Best available path (device pipeline + host stealing)."""
    try:
        return run_pairs_device(sketches, params, pairs)
    except Exception:
        return run_pairs_native(sketches, params, pairs)


def main():
    t0 = time.time()
    genomes = make_genomes(N_GENOMES)
    sketches, params = sketch_genomes(genomes)
    pairs = [(i, j) for i in range(N_GENOMES) for j in range(N_GENOMES)
             if i < j]
    prep_s = time.time() - t0

    # warm (JIT compile etc.) on a small subset, excluded from timing.
    # The warm runs on a watchdog thread: a down/unclaimable TPU pool can
    # HANG the first jax call indefinitely (not error), and the bench must
    # still print its JSON line — fall back to the native path if the
    # device does not come up in time.
    import threading
    warm_ok = [False]

    def _warm():
        try:
            run_pairs_device(sketches, params, pairs[:4])
            warm_ok[0] = True
        except Exception:
            pass

    wt = threading.Thread(target=_warm, daemon=True)
    wt.start()
    wt.join(timeout=float(os.environ.get("BENCH_DEVICE_WARM_TIMEOUT",
                                         "1800")))
    device_up = warm_ok[0]
    if not device_up:
        sys.stderr.write("# device path unavailable (warm failed or timed "
                         "out); native-only bench\n")

    best_s = float("inf")
    for _rep in range(2):   # best-of-2: the tunneled TPU is noisy-neighbored
        t0 = time.time()
        res_best = (run_pairs_best(sketches, params, pairs) if device_up
                    else run_pairs_native(sketches, params, pairs))
        best_s = min(best_s, time.time() - t0)
    best_rate = len(pairs) / best_s

    # device-ONLY throughput (no host steal-workers): the honest
    # accelerator number, reported alongside the hybrid best path
    dev_s = float("inf")
    res_dev = None
    if device_up:
        try:
            for _rep in range(2):
                t0 = time.time()
                res_dev = run_pairs_device(sketches, params, pairs,
                                           host_workers=0)
                dev_s = min(dev_s, time.time() - t0)
        except Exception:
            pass
    dev_rate = len(pairs) / dev_s if res_dev is not None else 0.0

    base_s = float("inf")
    for _rep in range(2):
        t0 = time.time()
        res_base = run_pairs_native(sketches, params, pairs)
        base_s = min(base_s, time.time() - t0)
    base_rate = len(pairs) / base_s

    # sanity: results must agree between paths
    mism = sum(1 for a, b in zip(res_best, res_base)
               if not (np.isnan(a.ani) and np.isnan(b.ani)) and a.ani != b.ani)
    if res_dev is not None:
        mism += sum(
            1 for a, b in zip(res_dev, res_base)
            if not (np.isnan(a.ani) and np.isnan(b.ani)) and a.ani != b.ani)

    sys.stderr.write(
        f"# {len(pairs)} pairs of {N_GENOMES} E.coli-scale genomes; "
        f"prep {prep_s:.1f}s; best {best_s:.2f}s ({best_rate:.1f}/s); "
        f"device-only {dev_s:.2f}s ({dev_rate:.1f}/s); "
        f"single-thread-reference {base_s:.2f}s ({base_rate:.1f}/s); "
        f"mismatches {mism}\n")
    out = {
        "metric": "unique genome-pairs/s (triangle all-vs-all, "
                  "E.coli-scale)",
        "value": round(best_rate, 2),
        "unit": "pairs/s",
        "vs_baseline": round(best_rate / base_rate, 3),
        "device_only": round(dev_rate, 2),
        "device_only_vs_baseline": round(dev_rate / base_rate, 3),
        "mismatches": mism,
    }
    if not device_up:
        # the accelerator pool never came up (warm timed out): this run
        # measured the native CPU fallback only, not the device engine
        out["device_unavailable"] = True
    print(json.dumps(out))
    if not device_up:
        # a wedged axon client can hang interpreter shutdown (atexit
        # backend sync); the JSON is out, exit hard
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)


if __name__ == "__main__":
    main()
