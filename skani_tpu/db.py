"""Sketch persistence: skani-compatible binary formats.

Implements readers/writers for the reference's on-disk formats so existing
skani databases interoperate:

* `.sketch` files: bincode-encoded (SketchParams, Sketch)
  (reference: src/file_io.rs:680-718, serde derives in src/types.rs:252 &
  src/params.rs:136);
* `markers.bin`: bincode (SketchParams, Vec<Sketch>) of marker-only sketches
  (reference: src/file_io.rs:720-729);
* consolidated DB: `sketches.db` (concatenated bincode blobs) + `index.db`
  (bincode Vec<IndexEntry{file_name, offset, length}>)
  (reference: src/sketch_db.rs:10-139).

bincode v1 default config: little-endian, fixed-size ints (usize as u64),
Vec/String/HashMap/HashSet as u64 length + payload, Option as 1-byte tag.
Parsing uses NumPy views over an mmap for the hot arrays.
"""
from __future__ import annotations

import mmap
import os
import struct
from typing import List, Tuple

import numpy as np

from .params import SketchParams
from .sketch import Sketch

_PAIR_DT = np.dtype({"names": ["k", "v"], "formats": ["<u4", "<u8"],
                     "offsets": [0, 4], "itemsize": 12})
_SEEDPOS_DT = np.dtype([("pos", "<u4"), ("cic", "<u4")])


class _Reader:
    def __init__(self, buf, off: int = 0):
        self.buf = buf
        self.off = off

    def u64(self) -> int:
        v = struct.unpack_from("<Q", self.buf, self.off)[0]
        self.off += 8
        return v

    def u32(self) -> int:
        v = struct.unpack_from("<I", self.buf, self.off)[0]
        self.off += 4
        return v

    def u8(self) -> int:
        v = self.buf[self.off]
        self.off += 1
        return v

    def raw(self, n: int) -> bytes:
        v = bytes(self.buf[self.off:self.off + n])
        self.off += n
        return v

    def string(self) -> str:
        n = self.u64()
        return self.raw(n).decode("utf-8")

    def np_view(self, dtype, count: int) -> np.ndarray:
        nbytes = dtype.itemsize * count
        arr = np.frombuffer(self.buf, dtype=dtype, count=count,
                            offset=self.off)
        self.off += nbytes
        return arr


def _read_sketch_params(r: _Reader) -> SketchParams:
    c = r.u64()
    k = r.u64()
    marker_c = r.u64()
    use_syncs = bool(r.u8())
    use_aa = bool(r.u8())
    n = r.u64()
    r.np_view(np.dtype("<u8"), n)       # acgt_to_aa_encoding
    n = r.u64()
    r.raw(n)                             # acgt_to_aa_letters
    r.u64()                              # orf_size
    return SketchParams(c=c, k=k, marker_c=marker_c, use_syncs=use_syncs,
                        use_aa=use_aa)


def _read_sketch(r: _Reader) -> Sketch:
    sk = Sketch()
    sk.file_name = r.string()
    has_seeds = r.u8()
    kmers = pos = cic = None
    multi: List[np.ndarray] = []
    if has_seeds:
        n = r.u64()
        pairs = r.np_view(_PAIR_DT, n)
        kmers = pairs["k"]
        tagged = pairs["v"]
    n_multi = r.u64()
    for _ in range(n_multi):
        m = r.u64()
        multi.append(r.np_view(_SEEDPOS_DT, m))
    n_ctg = r.u64()
    sk.contigs = [r.string() for _ in range(n_ctg)]
    sk.total_sequence_length = r.u64()
    n = r.u64()
    sk.contig_lengths = r.np_view(np.dtype("<u4"), n).copy()
    r.u64()  # repetitive_kmers
    n = r.u64()
    sk.marker_seeds = np.sort(r.np_view(np.dtype("<u8"), n))
    sk.marker_c = r.u64()
    sk.c = r.u64()
    sk.k = r.u64()
    sk.contig_order = r.u64()
    sk.individual_contig = bool(r.u8())
    sk.amino_acid = bool(r.u8())

    if has_seeds and len(kmers):
        # Expand tagged indices (reference: src/types.rs:207-244):
        # bit0=1 -> single packed SeedPosition in bits 1..; bit0=0 ->
        # bits 1.. index multi_position_storage.
        single = (tagged & np.uint64(1)) != 0
        payload = tagged >> np.uint64(1)
        s_pos = (payload >> np.uint64(31)).astype(np.uint32)
        s_cic = (payload & np.uint64(0x7FFFFFFF)).astype(np.uint32)
        out_k, out_pos, out_cic = [], [], []
        out_k.append(np.repeat(kmers[single], 1))
        out_pos.append(s_pos[single])
        out_cic.append(s_cic[single])
        midx = payload[~single].astype(np.int64)
        mk = kmers[~single]
        for i in range(len(midx)):
            mv = multi[midx[i]]
            out_k.append(np.full(len(mv), mk[i], dtype=np.uint32))
            out_pos.append(mv["pos"].copy())
            out_cic.append(mv["cic"].copy())
        allk = np.concatenate(out_k)
        allp = np.concatenate(out_pos)
        allc = np.concatenate(out_cic)
        order = np.argsort(allk, kind="stable")
        allk = allk[order]
        sk.seed_pos = allp[order]
        cics = allc[order]
        sk.seed_canon = (cics & 1).astype(bool)
        sk.seed_contig = cics >> np.uint32(1)
        uniq, starts = np.unique(allk, return_index=True)
        sk.seed_kmers = uniq
        sk.seed_starts = np.append(starts, len(allk)).astype(np.int64)
    return sk


class _Writer:
    def __init__(self):
        self.parts: List[bytes] = []

    def u64(self, v: int):
        self.parts.append(struct.pack("<Q", v))

    def u8(self, v: int):
        self.parts.append(struct.pack("<B", v))

    def raw(self, b: bytes):
        self.parts.append(b)

    def string(self, s: str):
        b = s.encode("utf-8")
        self.u64(len(b))
        self.raw(b)

    def getvalue(self) -> bytes:
        return b"".join(self.parts)


def _write_sketch_params(w: _Writer, p: SketchParams):
    w.u64(p.c)
    w.u64(p.k)
    w.u64(p.marker_c)
    w.u8(int(p.use_syncs))
    w.u8(int(p.use_aa))
    enc = p.acgt_to_aa_encoding
    w.u64(len(enc))
    w.raw(np.asarray(enc, dtype="<u8").tobytes())
    from .params import DNA_TO_AA
    w.u64(len(DNA_TO_AA))
    w.raw(bytes(DNA_TO_AA))
    w.u64(30)  # orf_size


def _write_sketch(w: _Writer, sk: Sketch, markers_only: bool = False):
    w.string(sk.file_name)
    has_seeds = (not markers_only) and len(sk.seed_kmers) > 0
    w.u8(1 if has_seeds else 0)
    multi_blobs: List[bytes] = []
    if has_seeds:
        counts = sk.seed_counts
        n = len(sk.seed_kmers)
        w.u64(n)
        cic = (sk.seed_contig.astype(np.uint64) << np.uint64(1)) \
            | sk.seed_canon.astype(np.uint64)
        packed = (sk.seed_pos.astype(np.uint64) << np.uint64(31)) | cic
        tagged = np.empty(n, dtype=np.uint64)
        singles = counts == 1
        tagged[singles] = (packed[sk.seed_starts[:-1][singles]]
                           << np.uint64(1)) | np.uint64(1)
        multi_ids = np.nonzero(~singles)[0]
        for storage_index, ki in enumerate(multi_ids):
            s, e = sk.seed_starts[ki], sk.seed_starts[ki + 1]
            tagged[ki] = np.uint64(storage_index) << np.uint64(1)
            sub = np.empty(e - s, dtype=_SEEDPOS_DT)
            sub["pos"] = sk.seed_pos[s:e]
            sub["cic"] = cic[s:e].astype(np.uint32)
            multi_blobs.append(struct.pack("<Q", e - s) + sub.tobytes())
        pairs = np.empty(n, dtype=_PAIR_DT)
        pairs["k"] = sk.seed_kmers
        pairs["v"] = tagged
        w.raw(pairs.tobytes())
    w.u64(len(multi_blobs))
    for b in multi_blobs:
        w.raw(b)
    w.u64(len(sk.contigs))
    for cname in sk.contigs:
        w.string(cname)
    w.u64(sk.total_sequence_length)
    if markers_only:
        w.u64(0)
    else:
        w.u64(len(sk.contig_lengths))
        w.raw(sk.contig_lengths.astype("<u4").tobytes())
    w.u64(0)  # repetitive_kmers
    w.u64(len(sk.marker_seeds))
    w.raw(sk.marker_seeds.astype("<u8").tobytes())
    w.u64(sk.marker_c)
    w.u64(sk.c)
    w.u64(sk.k)
    w.u64(sk.contig_order)
    w.u8(int(sk.individual_contig))
    w.u8(int(sk.amino_acid))


def serialize_sketch(params: SketchParams, sk: Sketch,
                     markers_only: bool = False) -> bytes:
    w = _Writer()
    _write_sketch_params(w, params)
    _write_sketch(w, sk, markers_only=markers_only)
    return w.getvalue()


def read_sketch_file(path: str) -> Tuple[SketchParams, Sketch]:
    """Read one bincode (SketchParams, Sketch) file
    (reference: src/file_io.rs:680-718)."""
    with open(path, "rb") as f:
        buf = f.read()
    r = _Reader(buf)
    params = _read_sketch_params(r)
    sk = _read_sketch(r)
    return params, sk


def write_sketch_file(path: str, params: SketchParams, sk: Sketch) -> None:
    with open(path, "wb") as f:
        f.write(serialize_sketch(params, sk))


def read_sketch_file_legacy(path: str) -> Tuple[SketchParams, Sketch]:
    """Read a pre-v0.3 skani .sketch file (the reference REJECTS these,
    src/file_io.rs:703-709; we support them read-only as a convenience and
    as golden fixtures).  Old SeedPosition = {pos u32, canonical u8,
    contig_index u32, phase u8} inline in per-kmer smallvecs; no
    multi_position_storage / individual_contig fields."""
    with open(path, "rb") as f:
        buf = f.read()
    r = _Reader(buf)
    params = _read_sketch_params(r)
    sk = Sketch()
    sk.file_name = r.string()
    has_seeds = r.u8()
    allk = allp = allc = allcan = None
    if has_seeds:
        n = r.u64()
        ks, ps, cs, cans = [], [], [], []
        dt = np.dtype({"names": ["pos", "canon", "ctg", "phase"],
                       "formats": ["<u4", "u1", "<u4", "u1"],
                       "offsets": [0, 4, 5, 9], "itemsize": 10})
        for _ in range(n):
            k = r.u32()
            m = r.u64()
            sub = r.np_view(dt, m)
            ks.append(np.full(m, k, dtype=np.uint32))
            ps.append(sub["pos"].copy())
            cs.append(sub["ctg"].copy())
            cans.append(sub["canon"].astype(bool))
        allk = np.concatenate(ks)
        allp = np.concatenate(ps)
        allc = np.concatenate(cs)
        allcan = np.concatenate(cans)
    n_ctg = r.u64()
    sk.contigs = [r.string() for _ in range(n_ctg)]
    sk.total_sequence_length = r.u64()
    n = r.u64()
    sk.contig_lengths = r.np_view(np.dtype("<u4"), n).copy()
    r.u64()  # repetitive_kmers
    n = r.u64()
    sk.marker_seeds = np.sort(r.np_view(np.dtype("<u8"), n))
    sk.marker_c = r.u64()
    sk.c = r.u64()
    sk.k = r.u64()
    sk.contig_order = r.u64()
    sk.amino_acid = bool(r.u8())
    if has_seeds and len(allk):
        order = np.argsort(allk, kind="stable")
        allk = allk[order]
        sk.seed_pos = allp[order]
        sk.seed_contig = allc[order]
        sk.seed_canon = allcan[order]
        uniq, starts = np.unique(allk, return_index=True)
        sk.seed_kmers = uniq
        sk.seed_starts = np.append(starts, len(allk)).astype(np.int64)
    return params, sk


def sketches_from_sketch(paths: List[str]):
    """reference: src/file_io.rs:680-718 (skips markers.bin; sorts by name)."""
    params = SketchParams()
    out = []
    for p in paths:
        if "markers.bin" in p:
            continue
        try:
            params, sk = read_sketch_file(p)
            out.append(sk)
        except Exception:
            raise IOError(
                f"{p} is not a valid .sketch file or is corrupted.")
    out.sort(key=lambda s: s.file_name)
    return params, out


def read_markers_bin(path: str) -> Tuple[SketchParams, List[Sketch]]:
    """reference: src/file_io.rs:720-729 — bincode (SketchParams, Vec<Sketch>)."""
    with open(path, "rb") as f:
        buf = f.read()
    r = _Reader(buf)
    params = _read_sketch_params(r)
    n = r.u64()
    sketches = [_read_sketch(r) for _ in range(n)]
    return params, sketches


def write_markers_bin(path: str, params: SketchParams,
                      sketches: List[Sketch]) -> None:
    w = _Writer()
    _write_sketch_params(w, params)
    w.u64(len(sketches))
    for sk in sketches:
        _write_sketch(w, sk, markers_only=True)
    with open(path, "wb") as f:
        f.write(w.getvalue())


class SketchDbWriter:
    """Consolidated DB writer (reference: src/sketch_db.rs:30-82)."""

    def __init__(self, output_dir: str):
        self.dir = output_dir
        self.f = open(os.path.join(output_dir, "sketches.db"), "wb")
        self.index: List[Tuple[str, int, int]] = []
        self.offset = 0

    def add_sketch(self, params: SketchParams, sk: Sketch) -> None:
        blob = serialize_sketch(params, sk)
        self.index.append((sk.file_name, self.offset, len(blob)))
        self.f.write(blob)
        self.offset += len(blob)

    def finalize(self) -> None:
        self.f.close()
        w = _Writer()
        w.u64(len(self.index))
        for name, off, length in self.index:
            w.string(name)
            w.u64(off)
            w.u64(length)
        with open(os.path.join(self.dir, "index.db"), "wb") as f:
            f.write(w.getvalue())


class SketchDbReader:
    """mmap-backed lazy reader (reference: src/sketch_db.rs:84-139)."""

    def __init__(self, database_dir: str):
        with open(os.path.join(database_dir, "index.db"), "rb") as f:
            r = _Reader(f.read())
        n = r.u64()
        self.index = []
        for _ in range(n):
            _name = r.string()
            off = r.u64()
            length = r.u64()
            self.index.append((off, length))
        self._file = open(os.path.join(database_dir, "sketches.db"), "rb")
        self.mmap = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)

    def get_sketch(self, i: int) -> Tuple[SketchParams, Sketch]:
        off, length = self.index[i]
        r = _Reader(self.mmap, off)
        params = _read_sketch_params(r)
        sk = _read_sketch(r)
        return params, sk

    def __len__(self):
        return len(self.index)

    def close(self):
        self.mmap.close()
        self._file.close()


def is_consolidated_db(database_dir: str) -> bool:
    return (os.path.exists(os.path.join(database_dir, "sketches.db"))
            and os.path.exists(os.path.join(database_dir, "index.db")))


def has_separate_sketches(database_dir: str) -> bool:
    try:
        return any(f.endswith(".sketch") for f in os.listdir(database_dir))
    except OSError:
        return False


# ---------------------------------------------------------------------------
# shard manifest (multi-host cold start; no reference analog — the
# reference is single-node.  SURVEY §5.8 / §7.5)
# ---------------------------------------------------------------------------

def shard_indices(n_genomes: int, n_shards: int, shard: int) -> List[int]:
    """Round-robin genome ownership — matches MultiHostPairFleet /
    ShardedPairFleet device ownership (genome g -> shard g % n)."""
    return list(range(shard, n_genomes, n_shards)) if n_shards > 0 else []


def write_shard_manifest(database_dir: str, n_shards: int) -> None:
    """Record the shard layout in the consolidated DB so a multi-host
    fleet can cold-start: each host reads shards.json, takes its
    round-robin slice, and mmap-loads only those (offset, length) entries
    from sketches.db."""
    import json
    with open(os.path.join(database_dir, "index.db"), "rb") as f:
        r = _Reader(f.read())
    n = r.u64()
    manifest = {
        "version": 1,
        "n_shards": int(n_shards),
        "n_genomes": int(n),
        "assignment": "round_robin",
    }
    with open(os.path.join(database_dir, "shards.json"), "w") as f:
        json.dump(manifest, f, indent=1)


def read_shard_manifest(database_dir: str):
    """Returns the manifest dict, or None when the DB has no shard layout
    (single-host DBs)."""
    import json
    path = os.path.join(database_dir, "shards.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)
