"""FracMinHash sketching — exact NumPy reference path.

This module is the vectorized "scalar spec" of the sketcher.  The reference
validates its AVX2 kernel against its scalar kernel
(reference: tests/tests.rs:130-144); we do the same: the TPU (Pallas) sketcher
in kernels/seeding_tpu.py is validated bit-for-bit against this module, and
this module transcribes the reference semantics
(reference: src/seeding.rs:225-323) exactly:

* the seed k-mer is the LOW 2k bits of the rolling 21-mer marker window, and
  the reverse-strand seed is the LOW 2k bits of the reverse-complement 21-mer
  (which covers a *different* sub-window of the 21-mer) — a quirk that must be
  preserved for output compatibility (reference: src/seeding.rs:288-289);
* canonical selection by numeric min of those two values;
* a k-mer is sampled iff mm_hash64(canonical seed) < u64::MAX/c, and the
  canonical full 21-mer is inserted as a marker iff that same hash is also
  < u64::MAX/marker_c (reference: src/seeding.rs:299-321);
* positions within k after an 'N'/'n' (at index >= 20 only) are skipped
  (reference: src/seeding.rs:272-274,300).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from . import fastx
from .hashing import mm_hash64
from .params import (ASCII_N, ASCII_N_SMALL, K_MARKER_DNA, MIN_LENGTH_CONTIG,
                     SketchParams)

_U = np.uint64

# 2-bit DNA encoding (reference: src/types.rs:40-49)
BYTE_TO_SEQ = np.zeros(256, dtype=np.uint64)
for _b, _v in ((67, 1), (71, 2), (84, 3), (85, 3),
               (99, 1), (103, 2), (116, 3), (117, 3)):
    BYTE_TO_SEQ[_b] = _v


@dataclasses.dataclass
class Sketch:
    """A genome sketch in tensor (struct-of-arrays, CSR) layout.

    Unlike the reference's hashmap-of-smallvecs (reference: src/types.rs:253),
    seeds are stored sorted by k-mer with CSR offsets — the layout that
    sort-merge joins and batched device kernels want.
    """
    file_name: str = ""
    contigs: List[str] = dataclasses.field(default_factory=list)
    contig_lengths: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, dtype=np.uint32))
    total_sequence_length: int = 0
    # CSR over unique seed k-mers (sorted ascending)
    seed_kmers: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, dtype=np.uint32))
    seed_starts: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(1, dtype=np.int64))
    seed_pos: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, dtype=np.uint32))
    seed_contig: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, dtype=np.uint32))
    seed_canon: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, dtype=bool))
    marker_seeds: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, dtype=np.uint64))  # sorted unique
    marker_c: int = 0
    c: int = 0
    k: int = 0
    contig_order: int = 0
    individual_contig: bool = False
    amino_acid: bool = False

    @property
    def num_seed_kmers(self) -> int:
        return len(self.seed_kmers)

    @property
    def seed_counts(self) -> np.ndarray:
        return np.diff(self.seed_starts)

    def sort_key(self):
        # reference: src/types.rs:360-364
        return (self.file_name, self.contig_order)

    def get_markers_only(self) -> "Sketch":
        """reference: src/types.rs:322-340 (drops seeds and contig_lengths)."""
        return Sketch(
            file_name=self.file_name,
            contigs=list(self.contigs),
            contig_lengths=np.zeros(0, dtype=np.uint32),
            total_sequence_length=self.total_sequence_length,
            marker_seeds=self.marker_seeds,
            marker_c=self.marker_c,
            c=self.c,
            k=self.k,
            contig_order=self.contig_order,
            individual_contig=self.individual_contig,
            amino_acid=self.amino_acid,
        )


def fmh_seeds_np(seq: np.ndarray, params: SketchParams):
    """Exact NumPy transcription of the reference scalar sketcher
    (reference: src/seeding.rs:225-323) for one contig.

    Returns (seed_kmers u32, positions u32, canonical bool, markers u64) in
    scan (encounter) order; markers are NOT deduplicated here.
    """
    mk = K_MARKER_DNA
    k = params.k
    c = params.c
    if k > 16:
        raise ValueError(f"Value of k > 16 for DNA; not allowed.")
    L = len(seq)
    empty = (np.zeros(0, np.uint32), np.zeros(0, np.uint32),
             np.zeros(0, bool), np.zeros(0, np.uint64))
    if L < 2 * mk:
        return empty

    codes = BYTE_TO_SEQ[seq]
    nw = L - mk + 1  # windows; window w ends at i = w + mk - 1
    F = np.zeros(nw, dtype=np.uint64)
    R = np.zeros(nw, dtype=np.uint64)
    for t in range(mk):
        F |= codes[t:t + nw] << _U(2 * (mk - 1 - t))
        R |= (_U(3) - codes[t:t + nw]) << _U(2 * t)

    seed_mask = _U((1 << (2 * k)) - 1)
    fs = F & seed_mask
    rs = R & seed_mask
    canon = fs < rs
    kmer = np.where(canon, fs, rs)
    h = mm_hash64(kmer)

    threshold = _U((2 ** 64 - 1) // c)
    threshold_marker = _U((2 ** 64 - 1) // params.marker_c)

    # N handling: an N at index i >= mk-1 suppresses sampling until i + k
    # (resume_ind semantics, reference: src/seeding.rs:272-274,300).
    i_idx = np.arange(mk - 1, L, dtype=np.int64)
    is_n = (seq[mk - 1:] == ASCII_N) | (seq[mk - 1:] == ASCII_N_SMALL)
    last_n = np.where(is_n, i_idx, np.int64(-1 << 40))
    last_n = np.maximum.accumulate(last_n)
    n_ok = last_n + k <= i_idx

    keep = (h < threshold) & n_ok
    if not keep.any():
        return empty

    canon_m = F < R
    marker_kmer = np.where(canon_m, F, R)
    keep_m = keep & (h < threshold_marker)

    positions = (np.nonzero(keep)[0] + (mk - 1)).astype(np.uint32)
    return (kmer[keep].astype(np.uint32), positions, canon[keep],
            marker_kmer[keep_m])


def _finalize_sketch(sk: Sketch, kmers_parts, pos_parts, canon_parts,
                     contig_parts, marker_parts) -> None:
    """Assemble CSR arrays from per-contig streams (stable by encounter order,
    preserving the reference's per-seed multi-position insertion order)."""
    if kmers_parts:
        kmers = np.concatenate(kmers_parts)
        pos = np.concatenate(pos_parts)
        canon = np.concatenate(canon_parts)
        contig = np.concatenate(contig_parts)
        order = np.argsort(kmers, kind="stable")
        kmers = kmers[order]
        sk.seed_pos = pos[order]
        sk.seed_canon = canon[order]
        sk.seed_contig = contig[order]
        uniq, starts = np.unique(kmers, return_index=True)
        sk.seed_kmers = uniq
        sk.seed_starts = np.append(starts, len(kmers)).astype(np.int64)
    if marker_parts:
        sk.marker_seeds = np.unique(np.concatenate(marker_parts))


_LINK_FAST: Optional[bool] = None


def _link_probe_cache_path() -> str:
    import os
    return os.path.join(
        os.environ.get("SKANI_TPU_CACHE_DIR",
                       os.path.expanduser("~/.cache/skani_jax")),
        "link_probe.json")


def _link_probe_key() -> str:
    import os
    return os.environ.get("PALLAS_AXON_POOL_IPS", "local")


def _accelerator_link_is_fast(threshold_bytes_per_s: float = 2e8) -> bool:
    """One-time probe of host->accelerator bandwidth.  Device seeding is
    transfer-bound (raw 2-bit-encodable sequence up, survivors down): it
    only wins over the native C++ kernel on a locally attached accelerator
    (PCIe/ICI, GB/s), never over a tunneled link (~60 MB/s here).

    The verdict is CACHED ON DISK (24 h, keyed by the accelerator
    endpoint): the probe itself costs a device claim + first-touch,
    which on a contended tunneled pool is minutes (measured 211 s) —
    without the cache every fresh CLI process re-paid it the moment the
    workload crossed _PROBE_MIN_BASES."""
    global _LINK_FAST
    if _LINK_FAST is None:
        import json
        import os
        import time as _time
        try:
            with open(_link_probe_cache_path()) as f:
                ent = json.load(f)
            if ent.get("key") == _link_probe_key() \
                    and _time.time() - ent.get("ts", 0) < 86400:
                _LINK_FAST = bool(ent["fast"])
                return _LINK_FAST
        except Exception:
            pass
    if _LINK_FAST is None:
        # watchdogged backend probe first: a wedged device pool hangs
        # jax.devices() forever, and sketching must degrade to the
        # native kernel instead of hanging the whole run
        from . import engine
        if not engine._accelerator_present():
            _LINK_FAST = False
            return _LINK_FAST
        try:
            import time

            import jax
            dev = jax.devices()[0]
            if dev.platform == "cpu":
                _LINK_FAST = False
            else:
                import jax.numpy as jnp
                # warm the dispatch path, then time a FRESH buffer — jax
                # reuses the committed device buffer when the same host
                # array is re-put, which would fake an instant transfer
                warm = np.zeros(1 << 20, dtype=np.uint8)
                np.asarray(jax.device_put(jnp.asarray(warm), dev)[:8])
                payload = np.random.default_rng(0).integers(
                    0, 255, 4 << 20, dtype=np.uint8)
                t0 = time.perf_counter()
                buf = jax.device_put(jnp.asarray(payload), dev)
                np.asarray(buf[:8])
                dt = time.perf_counter() - t0
                _LINK_FAST = (len(payload) / max(dt, 1e-9)
                              ) > threshold_bytes_per_s
        except Exception:
            _LINK_FAST = False
        try:
            import json
            import os
            import time as _time
            path = _link_probe_cache_path()
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump({"key": _link_probe_key(), "fast": _LINK_FAST,
                           "ts": _time.time()}, f)
            os.replace(tmp, path)
        except Exception:
            pass
    return _LINK_FAST


# Auto-probing the accelerator link is only worth its cost (a device
# claim + transfer roundtrip — seconds, or minutes on a contended pool)
# when enough sequence is queued that batched device seeding could
# plausibly beat the native kernel (~84 Mbp/s/core measured).
_PROBE_MIN_BASES = 64_000_000


def default_seeder(params: Optional[SketchParams] = None,
                   total_bases: Optional[int] = None):
    """Fastest available bit-exact seeding kernel for this host: the
    batched device kernel (kernels/seeding_tpu.py) when an accelerator is
    attached over a fast local link AND the queued workload (total_bases
    hint) is large enough to amortize the probe, else the native C++
    kernel, else the NumPy reference; AA path for use_aa.

    SKANI_TPU_SEEDER=tpu/native/numpy overrides the probe.
    """
    if params is not None and params.use_aa:
        from .aa import fmh_seeds_aa_np
        return fmh_seeds_aa_np
    import os
    choice = os.environ.get("SKANI_TPU_SEEDER", "auto")
    if choice == "tpu" or (choice == "auto"
                           and total_bases is not None
                           and total_bases >= _PROBE_MIN_BASES
                           and _accelerator_link_is_fast()):
        from .kernels.seeding_tpu import fmh_seeds_tpu
        return fmh_seeds_tpu
    if choice != "numpy":
        try:
            from . import native
            if native.available():
                return native.fmh_seeds_native
        except Exception:
            pass
    return fmh_seeds_np


def sketch_file(path: str, params: SketchParams, seed: bool = True,
                seeder=None) -> Optional[Sketch]:
    """Sketch one fasta/fastq file into a single Sketch
    (reference: src/file_io.rs:141-252).  Returns None for invalid/empty
    files (caller warns+skips).  `seeder` overrides the per-contig kernel
    (e.g. the TPU kernel); defaults to the fastest bit-exact kernel.
    """
    seeder = seeder or default_seeder(params)
    sk = Sketch(file_name=path, marker_c=params.c, c=params.c, k=params.k,
                amino_acid=params.use_aa)
    kmers_parts, pos_parts, canon_parts, contig_parts, marker_parts = \
        [], [], [], [], []
    j = 0
    try:
        for name, seq in fastx.iter_fastx(path):
            if len(seq) >= MIN_LENGTH_CONTIG:
                sk.contigs.append(name)
                sk.contig_lengths = np.append(
                    sk.contig_lengths, np.uint32(len(seq)))
                sk.total_sequence_length += len(seq)
                if seed or True:  # markers always needed
                    km, po, ca, ma = seeder(seq, params)
                    if seed and len(km):
                        kmers_parts.append(km)
                        pos_parts.append(po)
                        canon_parts.append(ca)
                        contig_parts.append(
                            np.full(len(km), j, dtype=np.uint32))
                    if len(ma):
                        marker_parts.append(ma)
                j += 1
    except fastx.InvalidFastxError:
        return None
    if j == 0:
        return None
    _finalize_sketch(sk, kmers_parts, pos_parts, canon_parts, contig_parts,
                     marker_parts)
    return sk


def sketch_file_individual(path: str, params: SketchParams, seed: bool = True,
                           seeder=None) -> List[Sketch]:
    """One Sketch per contig (-i/--qi/--ri mode)
    (reference: src/file_io.rs:253-362)."""
    seeder = seeder or default_seeder(params)
    out = []
    j = 0
    try:
        for name, seq in fastx.iter_fastx(path):
            if len(seq) < MIN_LENGTH_CONTIG:
                continue
            sk = Sketch(file_name=path, marker_c=params.c, c=params.c,
                        k=params.k, amino_acid=params.use_aa,
                        individual_contig=True, contig_order=j)
            sk.contigs.append(name)
            sk.contig_lengths = np.array([len(seq)], dtype=np.uint32)
            sk.total_sequence_length = len(seq)
            km, po, ca, ma = seeder(seq, params)
            _finalize_sketch(
                sk,
                [km] if seed and len(km) else [],
                [po] if seed and len(po) else [],
                [ca] if seed and len(ca) else [],
                [np.zeros(len(km), dtype=np.uint32)] if seed and len(km) else [],
                [ma] if len(ma) else [])
            out.append(sk)
            j += 1
    except fastx.InvalidFastxError:
        return []
    return out


def _sketch_files_device_batch(paths: List[str], params: SketchParams,
                               seed: bool, warn) -> List[Sketch]:
    """Whole-file-set sketching through the BATCHED device seeder
    (kernels/seeding_tpu.fmh_seeds_tpu_batch): contigs from a window of
    files go to the device in bucketed batches, so dispatch and link
    round trips amortize across the set — the device analog of the
    reference's rayon-parallel file loop (reference: src/file_io.rs:147-149).
    Identical outputs to the per-contig path."""
    from .kernels.seeding_tpu import fmh_seeds_tpu_batch

    out: List[Optional[Sketch]] = [None] * len(paths)
    window: list = []      # (path idx, sk, [(j, seq), ...]) per valid file
    window_bases = 0

    def flush():
        nonlocal window, window_bases
        if not window:
            return
        seqs = []
        refs = []          # (window slot, contig idx)
        for w, (_pi, _sk, contigs) in enumerate(window):
            for j, s in contigs:
                refs.append((w, j))
                seqs.append(s)
        results = fmh_seeds_tpu_batch(seqs, params)
        parts = [([], [], [], [], []) for _ in window]
        for (w, j), (km, po, ca, ma) in zip(refs, results):
            pp = parts[w]
            if seed and len(km):
                pp[0].append(km)
                pp[1].append(po)
                pp[2].append(ca)
                pp[3].append(np.full(len(km), j, dtype=np.uint32))
            if len(ma):
                pp[4].append(ma)
        for (pi, sk, _contigs), pp in zip(window, parts):
            _finalize_sketch(sk, pp[0], pp[1], pp[2], pp[3], pp[4])
            out[pi] = sk
        window, window_bases = [], 0

    for pi, p in enumerate(paths):
        sk = Sketch(file_name=p, marker_c=params.c, c=params.c, k=params.k,
                    amino_acid=params.use_aa)
        contigs = []
        j = 0
        try:
            for name, seq in fastx.iter_fastx(p):
                if len(seq) >= MIN_LENGTH_CONTIG:
                    sk.contigs.append(name)
                    sk.contig_lengths = np.append(
                        sk.contig_lengths, np.uint32(len(seq)))
                    sk.total_sequence_length += len(seq)
                    contigs.append((j, seq))
                    j += 1
        except fastx.InvalidFastxError:
            continue
        if j == 0:
            continue
        window.append((pi, sk, contigs))
        window_bases += sk.total_sequence_length
        if window_bases >= (256 << 20):
            flush()
    flush()
    res = []
    for p, sk in zip(paths, out):
        if sk is None:
            if warn:
                warn(f"{p} is not a valid fasta/fastq file or has only "
                     f"contigs < {MIN_LENGTH_CONTIG} bp; skipping.")
            continue
        res.append(sk)
    res.sort(key=Sketch.sort_key)
    return res


def fastx_to_sketches(paths: List[str], params: SketchParams,
                      seed: bool = True, seeder=None,
                      warn=None, threads: int = 1) -> List[Sketch]:
    """reference: src/file_io.rs:141-252 (rayon-parallel over files, then
    sorted by (file_name, contig_order) for determinism).  The native C++
    seeding kernel releases the GIL, so `threads` scales across cores.
    When the device seeder is selected (fast local link + a file set big
    enough to amortize the link probe, or SKANI_TPU_SEEDER=tpu), the whole
    file set routes through the batched device path instead."""
    if seeder is None:
        import os as _os
        total = 0
        for p in paths:
            try:
                sz = _os.path.getsize(p)
            except OSError:
                continue
            # gz fasta compresses ~4x; a coarse hint is all the probe
            # gate needs
            total += sz * 4 if p.endswith(".gz") else sz
        eff = default_seeder(params, total_bases=total)
    else:
        eff = seeder
    if getattr(eff, "__name__", "") == "fmh_seeds_tpu" \
            and not params.use_aa:
        return _sketch_files_device_batch(paths, params, seed, warn)
    seeder = eff
    if threads > 1 and len(paths) > 1:
        import concurrent.futures as cf
        with cf.ThreadPoolExecutor(max_workers=threads) as ex:
            sks = list(ex.map(
                lambda p: sketch_file(p, params, seed=seed, seeder=seeder),
                paths))
    else:
        sks = [sketch_file(p, params, seed=seed, seeder=seeder)
               for p in paths]
    out = []
    for p, sk in zip(paths, sks):
        if sk is None:
            if warn:
                warn(f"{p} is not a valid fasta/fastq file or has only "
                     f"contigs < {MIN_LENGTH_CONTIG} bp; skipping.")
            continue
        out.append(sk)
    out.sort(key=Sketch.sort_key)
    return out


def fastx_to_multiple_sketch_rewrite(paths: List[str], params: SketchParams,
                                     seed: bool = True, seeder=None,
                                     warn=None) -> List[Sketch]:
    """reference: src/file_io.rs:253-362."""
    out = []
    for p in paths:
        sks = sketch_file_individual(p, params, seed=seed, seeder=seeder)
        if not sks and warn:
            warn(f"{p} is not a valid fasta/fastq file; skipping.")
        out.extend(sks)
    out.sort(key=Sketch.sort_key)
    return out
