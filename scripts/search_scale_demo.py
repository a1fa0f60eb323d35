#!/usr/bin/env python3
"""Scale demo: consolidated sketch-DB construction + memory-light search.

Synthesizes a database of N genomes (default 256; BENCH_DB_GENOMES to
change): one quarter E. coli-W derivatives at 0.5-4%% divergence (the
query's true neighborhood), the rest shuffled-decoy genomes that marker
screening must reject.  Then:

  1. builds the consolidated database (sketches.db / index.db /
     markers.bin — skani's v0.3 format) and reports construction rate;
  2. searches queries against it, reporting per-query latency and the
     screening hit rate (only screened-in sketches are lazily loaded from
     the mmapped database, reference: src/search.rs:146-166).

Usage: python scripts/search_scale_demo.py [out_dir]
Env:   BENCH_DB_GENOMES, BENCH_DB_GENOME_LEN (see below), and
       SKANI_SCALE_PHASE = all (default) | build (synth + DB only, runs
       fine on a CPU-only host) | search (reuse an existing out_dir DB).
"""
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from skani_tpu import CommandParams, SketchParams, engine
from skani_tpu import fastx
from skani_tpu.params import Mode

SOURCE = "/root/reference/test_files/e.coli-W.fasta.gz"
N = int(os.environ.get("BENCH_DB_GENOMES", "256"))
# genome length: full E. coli by default; cap it (e.g. 150000) to build
# 10k+ genome databases in reasonable time on one core
GLEN = int(os.environ.get("BENCH_DB_GENOME_LEN", "0"))
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def synth_genomes(out_dir: str):
    _name, seq = next(iter(fastx.iter_fastx(SOURCE)))
    if GLEN:
        seq = seq[:GLEN]
    rng = np.random.default_rng(11)
    paths = []
    n_rel = N // 4
    for i in range(N):
        if i < n_rel:  # related: point mutations off the source
            s = seq.copy()
            nmut = int(len(s) * (0.005 + 0.035 * i / max(n_rel - 1, 1)))
            pos = rng.choice(len(s), size=nmut, replace=False)
            s[pos] = BASES[rng.integers(0, 4, size=nmut)]
        else:          # decoy: unrelated (uniform random) sequence
            s = BASES[rng.integers(0, 4, size=len(seq))]
        p = os.path.join(out_dir, f"g{i:05d}.fa")
        with open(p, "wb") as f:
            f.write(b">g%d\n" % i + s.tobytes() + b"\n")
        paths.append(p)
    return paths


def main():
    phase = os.environ.get("SKANI_SCALE_PHASE", "all")
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="skani_scale_")
    gdir = os.path.join(work, "genomes")
    dbdir = os.path.join(work, "db")
    os.makedirs(gdir, exist_ok=True)

    if phase in ("all", "build"):
        if os.path.exists(dbdir):
            shutil.rmtree(dbdir)
        t0 = time.time()
        paths = synth_genomes(gdir)
        print(f"synthesized {N} genomes in {time.time() - t0:.1f}s")

        sp = SketchParams()
        cp = CommandParams(mode=Mode.SKETCH, out_file_name=dbdir,
                           ref_files=paths, threads=os.cpu_count() or 1)
        t0 = time.time()
        engine.sketch(cp, sp)
        dt = time.time() - t0
        db_bytes = sum(os.path.getsize(os.path.join(dbdir, f))
                       for f in os.listdir(dbdir))
        print(f"DB construction: {N} genomes in {dt:.1f}s "
              f"({N / dt:.1f} genomes/s), {db_bytes / 1e6:.1f} MB on disk")
        if phase == "build":
            print(f"workdir: {work}")
            return
    else:
        paths = sorted(os.path.join(gdir, f) for f in os.listdir(gdir))
        assert len(paths) == N, (len(paths), N)

    from skani_tpu.kernels import device_db

    queries = paths[:2] + paths[-1:]

    def run_search(tag):
        cp = CommandParams(
            mode=Mode.SEARCH,
            out_file_name=os.path.join(work, f"search_{tag}.tsv"),
            ref_files=[os.path.join(dbdir, f) for f in os.listdir(dbdir)],
            query_files=queries, refs_are_sketch=True, screen=True,
            max_results=10 ** 7, min_aligned_frac=-1.0,
            both_min_aligned_frac=-0.01, learned_ani=True,
            threads=os.cpu_count() or 1)
        up0 = device_db.UPLOAD_BYTES[0]
        t0 = time.time()
        res = engine.search(cp)
        dt = time.time() - t0
        up = device_db.UPLOAD_BYTES[0] - up0
        print(f"search[{tag}]: {len(queries)} queries vs {N}-genome DB in "
              f"{dt:.1f}s ({dt / len(queries):.2f} s/query), {len(res)} "
              f"hits, {up / 1e6:.1f} MB uploaded")
        return res

    # first run pays DB residency (upload-once) + compile; the repeat run
    # shows the steady-state per-query cost the resident design buys
    run_search("cold")
    run_search("warm")
    import resource
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(f"peak RSS: {rss_mb:.0f} MB")
    print(f"workdir: {work}")


if __name__ == "__main__":
    main()
