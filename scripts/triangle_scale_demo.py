#!/usr/bin/env python3
"""Streaming all-vs-all demo: N synthetic genomes through `triangle`
--sparse with bounded executor batches and 5000-row intermediate flushes.

Evidence for the scale claims: peak RSS stays flat (pairs are generated
row by row and results leave through append-mode flushes) while the pair
count grows quadratically.  Defaults: 300 genomes of ~40 kb -> 44,850
candidate pairs on one host.

Usage: python scripts/triangle_scale_demo.py [n_genomes] [genome_bp]
"""
import os
import resource
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from skani_tpu import CommandParams, SketchParams, engine  # noqa: E402

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    bp = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000
    rng = np.random.default_rng(11)
    base = BASES[rng.integers(0, 4, bp)]
    tmp = tempfile.mkdtemp(prefix="skani_tri_scale_")
    paths = []
    for g in range(n):
        s = base.copy()
        nmut = int(bp * rng.uniform(0.002, 0.08))
        p = rng.choice(bp, size=nmut, replace=False)
        s[p] = BASES[rng.integers(0, 4, nmut)]
        path = os.path.join(tmp, f"g{g:04d}.fa")
        with open(path, "wb") as f:
            f.write(b">g%04d\n" % g + s.tobytes() + b"\n")
        paths.append(path)

    out = os.path.join(tmp, "tri.tsv")
    cp = CommandParams(ref_files=paths, out_file_name=out, sparse=True,
                       screen=True, threads=3)
    sp = SketchParams()
    t0 = time.monotonic()
    engine.triangle(cp, sp)
    dt = time.monotonic() - t0
    rows = sum(1 for _ in open(out)) - 1
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(f"{n} genomes ({bp} bp), {n * (n - 1) // 2} candidate pairs -> "
          f"{rows} result rows in {dt:.1f}s; peak RSS {rss_mb:.0f} MB")


if __name__ == "__main__":
    main()
