#!/usr/bin/env python3
"""skani-tpu benchmark: genome-pairs/s plus regression tiers.

Tiers (BENCH_TIERS env, default all):

* **main** — N synthetic E. coli-derived genomes point-mutated at 0.3-2%
  (the reference's headline ANI range), all UNIQUE unordered pairs (the
  `triangle` workload) through the engine's best path.  Unique pairs are
  the honest accounting: the engine computes mirrored orientations by
  field-swapping one result, so ordered-pair rates would credit a
  symmetry trick the reference's triangle driver (reference:
  src/triangle.rs:71-105) gets for free too.
* **distant** — 5-18% mutants (82-95% ANI, the edge of the reference's
  stated accuracy envelope, reference: README.md:135-137): sparse
  anchors, different padded-domain utilization.  Guards the regime the
  main tier's near-identical pairs never exercise.
* **search** — search-shaped workload: a consolidated DB where 3/4 of
  the genomes are screen-rejected decoys, queried through the real
  `search` driver (markers screening + lazy loads + device residency;
  reference: src/search.rs).  Reports warm s/query.
* **cli** — the whole `triangle` CLI driver (sketching + screening +
  chaining + matrix write) as a subprocess: catches regressions that
  live outside the pair engine.

Baseline: the single-thread reference-equivalent path — our native C++
per-pair pipeline, which implements the reference algorithm exactly
(skani v0.3 is a single-binary Rust CLI; its published throughput claims
are qualitative, and no Rust toolchain exists in this image, so the
native path serves as the measured single-thread skani-equivalent).
vs_baseline is best-path throughput over that single-thread baseline.

Prints ONE JSON line; the headline keys are the main tier, and the
other tiers nest under "tiers".  ANY tier mismatch counts into the
top-level "mismatches" (the release gate).
"""
import json
import os
import shutil
import subprocess
import sys
import tempfile
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
# 32 genomes -> 496 unique pairs (16 batches of 32).  The earlier
# 20-genome default (190 pairs = 6 batches) spent ~20% of wall on
# pipeline fill/drain at round-5 engine speeds (measured: 762 vs 960
# pairs/s at 190 vs 496 pairs), so it under-reported the engine, not
# the edge effects it was sized to avoid.  The single-thread baseline
# runs the IDENTICAL workload, so vs_baseline stays apples-to-apples.
N_GENOMES = int(os.environ.get("BENCH_GENOMES", "32"))
TIERS = os.environ.get("BENCH_TIERS", "main,distant,search,cli").split(",")
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def make_genomes(n, lo=0.003, hi=0.02, seed=7):
    _name, seq = next(iter(fastx.iter_fastx(SOURCE)))
    rng = np.random.default_rng(seed)
    genomes = []
    for i in range(n):
        rate = lo + (hi - lo) * (i / max(n - 1, 1))
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


def run_pairs_device(sketches, params, pairs, host_workers=None,
                     key="eng"):
    """Device pipeline (engine cached across reps, like the CLI path)."""
    from skani_tpu.kernels.device_pipeline import DevicePairEngine
    eng = _ENGINE.get(key)
    if eng is None or len(eng.sketches) != len(sketches) \
            or any(a is not b for a, b in zip(eng.sketches, sketches)):
        eng = DevicePairEngine(sketches, params, CommandParams())
        _ENGINE[key] = eng
    return eng.run_pairs(pairs, host_workers=host_workers)


def run_pairs_best(sketches, params, pairs):
    """Best available path (device pipeline + host stealing)."""
    try:
        return run_pairs_device(sketches, params, pairs)
    except Exception:
        return run_pairs_native(sketches, params, pairs)


def count_mismatches(res_a, res_b):
    n = 0
    for a, b in zip(res_a, res_b):
        if np.isnan(a.ani) and np.isnan(b.ani):
            continue
        n += a.ani != b.ani
    return n


def tier_distant(device_up):
    """82-95%-ANI tier: 12 genomes at 5-18% divergence, 66 unique pairs.
    Sparse anchors + low AF exercise the padded domains the main tier's
    near-identical mutants never touch."""
    n = int(os.environ.get("BENCH_DISTANT_GENOMES", "24"))
    # STAR topology: ancestor + mutants, scored ancestor-vs-mutant, so
    # each pair's divergence is the mutant's own rate (mutant-vs-mutant
    # pairs would sum both rates and fall below the 82% envelope)
    genomes = (make_genomes(1, lo=0.0, hi=0.0, seed=23)
               + make_genomes(n - 1, lo=0.05, hi=0.18, seed=29))
    sketches, params = sketch_genomes(genomes)
    pairs = [(0, j) for j in range(1, n)]

    res_dev, dev_s = None, float("inf")
    if device_up:
        try:
            for _rep in range(2):
                t0 = time.time()
                res_dev = run_pairs_device(sketches, params, pairs,
                                           host_workers=0, key="distant")
                dev_s = min(dev_s, time.time() - t0)
        except Exception as e:
            sys.stderr.write(f"# distant tier device failed: {e}\n")
    t0 = time.time()
    res_base = run_pairs_native(sketches, params, pairs)
    base_s = time.time() - t0

    mism = count_mismatches(res_dev, res_base) if res_dev is not None else 0
    # sanity: the tier really covers the 82-95 envelope (nulled results,
    # ani <= 0, are excluded from the span but still bit-compared above)
    anis = sorted(r.ani for r in res_base
                  if not np.isnan(r.ani) and r.ani > 0)
    dev_rate = len(pairs) / dev_s if res_dev is not None else 0.0
    base_rate = len(pairs) / base_s
    sys.stderr.write(
        f"# distant tier: {len(pairs)} pairs, ANI span "
        f"{anis[0] * 100 if anis else 0:.1f}-"
        f"{anis[-1] * 100 if anis else 0:.1f}; device {dev_rate:.1f}/s "
        f"native {base_rate:.1f}/s; mismatches {mism}\n")
    return {
        "pairs_s_device": round(dev_rate, 2),
        "pairs_s_native_1t": round(base_rate, 2),
        "vs_native": round(dev_rate / base_rate, 3) if base_rate else 0.0,
        "ani_span": [round(anis[0] * 100, 2) if anis else None,
                     round(anis[-1] * 100, 2) if anis else None],
    }, mism


def tier_search(device_up):
    """Search-shaped tier through the REAL search driver: 3/4 decoys the
    marker screen must reject, consolidated DB, warm (device-resident)
    repeat queries.  Reference workload: src/search.rs + README.md:15."""
    from skani_tpu import engine
    from skani_tpu.params import Mode

    n = int(os.environ.get("BENCH_SEARCH_GENOMES", "512"))
    glen = int(os.environ.get("BENCH_SEARCH_GENOME_LEN", "150000"))
    _name, seq = next(iter(fastx.iter_fastx(SOURCE)))
    seq = seq[:glen]
    rng = np.random.default_rng(11)
    work = tempfile.mkdtemp(prefix="skani_bench_search_")
    try:
        gdir = os.path.join(work, "genomes")
        dbdir = os.path.join(work, "db")
        os.makedirs(gdir)
        paths = []
        n_rel = n // 4
        for i in range(n):
            if i < n_rel:
                s = seq.copy()
                nmut = int(len(s) * (0.005 + 0.035 * i / max(n_rel - 1, 1)))
                pos = rng.choice(len(s), size=nmut, replace=False)
                s[pos] = BASES[rng.integers(0, 4, size=nmut)]
            else:
                s = BASES[rng.integers(0, 4, size=len(seq))]
            p = os.path.join(gdir, f"g{i:05d}.fa")
            with open(p, "wb") as f:
                f.write(b">g%d\n" % i + s.tobytes() + b"\n")
            paths.append(p)

        sp = SketchParams()
        engine.sketch(CommandParams(mode=Mode.SKETCH, out_file_name=dbdir,
                                    ref_files=paths,
                                    threads=os.cpu_count() or 1), sp)
        queries = paths[:2] + paths[-1:]

        def one_search(tag):
            cp = CommandParams(
                mode=Mode.SEARCH,
                out_file_name=os.path.join(work, f"s_{tag}.tsv"),
                ref_files=[os.path.join(dbdir, f)
                           for f in os.listdir(dbdir)],
                query_files=queries, refs_are_sketch=True, screen=True,
                max_results=10 ** 7, min_aligned_frac=-1.0,
                both_min_aligned_frac=-0.01, learned_ani=True,
                threads=os.cpu_count() or 1)
            t0 = time.time()
            res = engine.search(cp)
            return (time.time() - t0) / len(queries), res

        cold_q, res_cold = one_search("cold")
        warm_q, res_warm = one_search("warm")
        # warm-vs-cold must agree row-for-row (same driver, same DB)
        key = lambda rs: sorted((r.ref_file, r.query_file, r.ani)
                                for r in rs)
        mism = 0 if key(res_cold) == key(res_warm) else 1
        sys.stderr.write(
            f"# search tier: {n}-genome DB ({n - n_rel} decoys), "
            f"{len(queries)} queries; cold {cold_q:.2f} s/q, warm "
            f"{warm_q:.2f} s/q, {len(res_warm)} hits; mismatches {mism}\n")
        return {
            "db_genomes": n,
            "decoy_fraction": round(1 - n_rel / n, 3),
            "cold_s_per_query": round(cold_q, 3),
            "warm_s_per_query": round(warm_q, 3),
            "hits": len(res_warm),
        }, mism
    finally:
        shutil.rmtree(work, ignore_errors=True)


def tier_cli_triangle():
    """Whole-driver CLI triangle: sketching + screening + chaining +
    sparse write, as a user would run it.  Catches regressions outside
    the pair engine (parsing, writers, orchestration).  Runs the NATIVE
    executor: the device engine is already measured by the main/distant
    tiers, and a subprocess claiming the accelerator pool while the
    parent bench holds it stalls ~1 min on claim contention (measured
    62 s in-bench vs 5.5 s standalone for the same workload)."""
    n = int(os.environ.get("BENCH_CLI_GENOMES", "14"))
    genomes = make_genomes(n, lo=0.003, hi=0.02, seed=41)
    work = tempfile.mkdtemp(prefix="skani_bench_cli_")
    try:
        paths = []
        for name, s in genomes:
            p = os.path.join(work, f"{name}.fa")
            with open(p, "wb") as f:
                f.write(b">" + name.encode() + b"\n" + s.tobytes() + b"\n")
            paths.append(p)
        out = os.path.join(work, "tri.tsv")
        env = dict(os.environ, SKANI_TPU_EXECUTOR="native")
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-m", "skani_tpu", "triangle", *paths,
             "-o", out, "--sparse", "-t", str(os.cpu_count() or 1)],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            env=env, capture_output=True, timeout=1800)
        wall = time.time() - t0
        n_pairs = n * (n - 1) // 2
        rows = 0
        if r.returncode == 0 and os.path.exists(out):
            with open(out) as f:
                rows = max(0, sum(1 for _ in f) - 1)
        ok = r.returncode == 0 and rows > 0
        sys.stderr.write(
            f"# cli tier: triangle over {n} genomes ({n_pairs} pairs) in "
            f"{wall:.1f}s wall ({n_pairs / wall:.1f} pairs/s incl. "
            f"sketching), {rows} rows, rc={r.returncode}\n")
        return {
            "pairs_s_wall": round(n_pairs / wall, 2),
            "wall_s": round(wall, 2),
            "rows": rows,
        }, 0 if ok else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


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
    mism = count_mismatches(res_best, res_base)
    if res_dev is not None:
        mism += count_mismatches(res_dev, res_base)

    sys.stderr.write(
        f"# {len(pairs)} pairs of {N_GENOMES} E.coli-scale genomes; "
        f"prep {prep_s:.1f}s; best {best_s:.2f}s ({best_rate:.1f}/s); "
        f"device-only {dev_s:.2f}s ({dev_rate:.1f}/s); "
        f"single-thread-reference {base_s:.2f}s ({base_rate:.1f}/s); "
        f"mismatches {mism}\n")

    tiers = {}
    if "distant" in TIERS:
        try:
            tiers["distant_82_95"], m = tier_distant(device_up)
            mism += m
        except Exception as e:
            sys.stderr.write(f"# distant tier crashed: {e}\n")
            tiers["distant_82_95"] = {"error": str(e)[:200]}
            mism += 1
    if "search" in TIERS:
        try:
            tiers["search_decoy"], m = tier_search(device_up)
            mism += m
        except Exception as e:
            sys.stderr.write(f"# search tier crashed: {e}\n")
            tiers["search_decoy"] = {"error": str(e)[:200]}
            mism += 1
    if "cli" in TIERS:
        try:
            tiers["cli_triangle"], m = tier_cli_triangle()
            mism += m
        except Exception as e:
            sys.stderr.write(f"# cli tier crashed: {e}\n")
            tiers["cli_triangle"] = {"error": str(e)[:200]}
            mism += 1

    out = {
        "metric": "unique genome-pairs/s (triangle all-vs-all, "
                  "E.coli-scale)",
        "value": round(best_rate, 2),
        "unit": "pairs/s",
        "vs_baseline": round(best_rate / base_rate, 3),
        "device_only": round(dev_rate, 2),
        "device_only_vs_baseline": round(dev_rate / base_rate, 3),
        "mismatches": mism,
        "tiers": tiers,
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
