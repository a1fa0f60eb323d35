#!/usr/bin/env python3
"""Eukaryote-MAG-scale demo: a ~65 Mbp genome pair scored ON DEVICE,
bit-exact against the native path.

This is the tier the reference exercises with its TOPAZ eukaryote MAG
fixtures (reference: tests/tests.rs:82-128) and the round-2 verdict's
"big-genome device coverage" item: a single-contig genome this size

  * exceeds the packed position word (pos >= 2^24 - 64K), forcing the
    UNPACKED sorted-generation mode;
  * exceeds 2^19 seed-position rows, forcing the split-gather join
    branch (the packed b_start << 12 | cnt join word runs out of bits);
  * needs bucket-scaled chunk/interval caps (~3250 real 20 kb fragments
    vs the 512 default).

Usage: python scripts/mag_scale_demo.py
Env:   BENCH_MAG_LEN (default 65_000_000), BENCH_MAG_DIV (default 0.02)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from skani_tpu import CommandParams, SketchParams
from skani_tpu.ani import chain_seeds_native
from skani_tpu.kernels.device_pipeline import DevicePairEngine
from skani_tpu.params import map_params_from_sketch
from skani_tpu.sketch import Sketch, _finalize_sketch, default_seeder

L = int(os.environ.get("BENCH_MAG_LEN", "65000000"))
DIV = float(os.environ.get("BENCH_MAG_DIV", "0.02"))
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _mk_sketch(seq, sp, name):
    seeder = default_seeder()
    sk = Sketch(file_name=name, marker_c=sp.marker_c, c=sp.c, k=sp.k)
    sk.contigs.append(f"{name}_c0")
    sk.contig_lengths = np.append(sk.contig_lengths, np.uint32(len(seq)))
    sk.total_sequence_length = len(seq)
    km, po, ca, ma = seeder(seq, sp)
    _finalize_sketch(sk, [km], [po], [ca],
                     [np.full(len(km), 0, np.uint32)], [ma])
    return sk


def main():
    rng = np.random.default_rng(3)
    t0 = time.time()
    base = BASES[rng.integers(0, 4, size=L)]
    other = base.copy()
    nm = int(L * DIV)
    p = rng.choice(L, size=nm, replace=False)
    other[p] = BASES[rng.integers(0, 4, size=nm)]
    print(f"synthesized 2 x {L / 1e6:.0f} Mbp genomes "
          f"({DIV:.1%} divergence) in {time.time() - t0:.1f}s")

    sp = SketchParams()          # default c=125 / k=15
    cp = CommandParams()
    t0 = time.time()
    sks = [_mk_sketch(base, sp, "magA"), _mk_sketch(other, sp, "magB")]
    print(f"sketched in {time.time() - t0:.1f}s "
          f"({len(sks[0].seed_pos)} / {len(sks[1].seed_pos)} seed "
          f"positions)")

    mp = map_params_from_sketch(sks[0], False, cp, None)
    t0 = time.time()
    want = [chain_seeds_native(sks[0], sks[1], mp),
            chain_seeds_native(sks[1], sks[0], mp)]
    t_native = time.time() - t0
    print(f"native: {t_native:.1f}s for 2 ordered pairs "
          f"(ANI {want[0].ani * 100:.2f}, AF "
          f"{want[0].align_fraction_query * 100:.1f}/"
          f"{want[0].align_fraction_ref * 100:.1f})")

    t0 = time.time()
    eng = DevicePairEngine(sks, sp, cp)
    assert eng.gen_mode == "sorted", eng.gen_mode     # unpacked tier
    assert eng.db.P >= (1 << 19), eng.db.P            # split-gather join
    icap, ccap = eng._caps_for(eng._bucket_a(0, 1))
    print(f"engine: mode={eng.gen_mode} join={eng.join_mode} "
          f"A={eng.A} P={eng.db.P} C_CAP={ccap} I_CAP={icap} "
          f"(built in {time.time() - t0:.1f}s)")

    pairs = [(0, 1), (1, 0)]
    t0 = time.time()
    got = eng.run_pairs(pairs, host_workers=0)   # device only, no stealing
    t_dev = time.time() - t0
    print(f"device (cold, incl. compile + upload): {t_dev:.1f}s")
    t0 = time.time()
    got = eng.run_pairs(pairs, host_workers=0)
    t_dev = time.time() - t0
    print(f"device (warm): {t_dev:.1f}s for 2 ordered pairs")

    bad = 0
    for a, b in zip(got, want):
        if np.isnan(a.ani) and np.isnan(b.ani):
            continue
        ok = (a.ani == b.ani
              and a.align_fraction_query == b.align_fraction_query
              and a.align_fraction_ref == b.align_fraction_ref
              and a.ci_lower == b.ci_lower and a.ci_upper == b.ci_upper)
        if not ok:
            print(f"MISMATCH: device ({a.ani}, {a.align_fraction_query}) "
                  f"!= native ({b.ani}, {b.align_fraction_query})")
        bad += not ok
    print(f"exactness: {'OK' if bad == 0 else f'{bad} MISMATCHES'}; "
          f"device {t_dev / 2:.2f} s/pair vs native "
          f"{t_native / 2:.2f} s/pair")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
