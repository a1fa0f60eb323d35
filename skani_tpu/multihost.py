"""Multi-host distribution layer (SURVEY §5.8 — new for the TPU build).

The reference is single-node shared-memory only; at TPU-pod scale the
sketch database must span hosts.  Three pieces live here:

* `init_from_env` — `jax.distributed.initialize` from SKANI_TPU_COORDINATOR
  / SKANI_TPU_NUM_PROCS / SKANI_TPU_PROC_ID, so every launcher (mpirun,
  GKE, a plain shell loop) can form the global device mesh the same way.
* DB shard manifest helpers are in db.py (`write_shard_manifest` /
  `read_shard_manifest`): a `shards.json` in the consolidated DB records
  the host-count the DB was laid out for and the round-robin assignment,
  so a fleet can cold-start with each host mmap-loading ONLY its slice of
  sketches.db (the index gives per-genome offsets).
* `MultiHostPairFleet` — the cross-process analog of
  parallel.ShardedPairFleet: reference genomes are owned round-robin by
  GLOBAL device index; each process builds engines only for its local
  devices and scores only the pairs it owns; numeric result planes are
  merged across processes with a single process_allgather, and every
  process reconstructs the full result list (strings come from the
  replicated marker-sketch metadata).

Tested on a 2-process x 4-virtual-CPU-device mesh in
tests/test_multihost.py — the CPU analog of a 2-host TPU slice that
SURVEY §4 calls for.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from .ani import AniEstResult

# numeric planes gathered across hosts; strings/bool are reconstructed
# from replicated sketch metadata
RESULT_FIELDS = (
    "ani", "align_fraction_query", "align_fraction_ref", "ci_upper",
    "ci_lower", "quant_90_contig_len_q", "quant_90_contig_len_r",
    "quant_50_contig_len_q", "quant_50_contig_len_r",
    "quant_10_contig_len_q", "quant_10_contig_len_r", "std",
    "num_contigs_q", "num_contigs_r", "avg_chain_int_len",
    "total_bases_covered",
)
_INT_FIELDS = {"num_contigs_q", "num_contigs_r", "avg_chain_int_len",
               "total_bases_covered"}


_ACTIVE = False


def is_active() -> bool:
    """True when init_from_env formed a multi-process runtime (cheap —
    never initializes jax for single-process callers)."""
    return _ACTIVE


def owner_process(global_index: int) -> int:
    """The process owning DB entry `global_index` under the round-robin
    device layout (matches MultiHostPairFleet's owner_dev)."""
    import jax
    devices = sorted(jax.devices(), key=lambda d: d.id)
    return devices[global_index % len(devices)].process_index


def init_from_env() -> bool:
    """Initialize jax.distributed from the environment; returns True when
    a multi-process runtime was formed.  Call before any other jax use."""
    coord = os.environ.get("SKANI_TPU_COORDINATOR")
    if not coord:
        return False
    import jax
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["SKANI_TPU_NUM_PROCS"]),
        process_id=int(os.environ["SKANI_TPU_PROC_ID"]))
    # Establish the global collective (Gloo/ICI) context NOW, while every
    # process is still in lockstep from the initialize() barrier.  The
    # context's key-value rendezvous has a fixed ~30 s deadline, and the
    # first real collective otherwise only happens after per-process
    # engine builds + XLA compiles, whose durations skew by minutes on
    # busy hosts — late arrival then kills the whole fleet with
    # "Gloo context initialization failed: DEADLINE_EXCEEDED".
    from jax.experimental import multihost_utils
    multihost_utils.process_allgather(np.zeros(1, dtype=np.float32))
    global _ACTIVE
    _ACTIVE = True
    return True


def pack_results(out: List[Optional[AniEstResult]]) -> np.ndarray:
    """(n_pairs, 1 + len(RESULT_FIELDS)) float64 plane; column 0 is the
    ownership mask (1.0 where this process computed the pair)."""
    plane = np.zeros((len(out), 1 + len(RESULT_FIELDS)), dtype=np.float64)
    for t, r in enumerate(out):
        if r is None:
            continue
        plane[t, 0] = 1.0
        for f, name in enumerate(RESULT_FIELDS):
            plane[t, 1 + f] = float(getattr(r, name))
    return plane


def unpack_result(row: np.ndarray, ref_sketch, query_sketch,
                  aai: bool) -> AniEstResult:
    r = AniEstResult()
    for f, name in enumerate(RESULT_FIELDS):
        v = row[1 + f]
        setattr(r, name, int(v) if name in _INT_FIELDS else float(v))
    r.ref_file = ref_sketch.file_name
    r.query_file = query_sketch.file_name
    r.ref_contig = ref_sketch.contigs[0] if ref_sketch.contigs else ""
    r.query_contig = query_sketch.contigs[0] if query_sketch.contigs else ""
    r.aai = aai
    return r


class MultiHostPairFleet:
    """Pair scoring over every device of a multi-process jax runtime.

    ref_sketches/query_sketches must be the same (metadata-equivalent)
    lists on every process — full seed arrays are only REQUIRED for the
    genomes a process owns plus the queries, matching the search flow
    where markers are replicated and heavy sketches stay on their shard.
    """

    def __init__(self, ref_sketches: Sequence, query_sketches: Sequence,
                 sketch_params, command_params, model=None,
                 batch: int = 32, **engine_kwargs):
        import jax
        from .kernels.device_pipeline import DevicePairEngine

        self.refs = list(ref_sketches)
        self.queries = list(query_sketches)
        self.pid = jax.process_index()
        devices = sorted(jax.devices(), key=lambda d: d.id)
        self.n_dev = len(devices)
        self.n_procs = jax.process_count()
        # process owning each device — every process derives the SAME
        # table, so per-process owned-pair counts (hence the compacted
        # merge shape) are globally known without a counts round-trip
        self.proc_of_dev = [d.process_index for d in devices]
        # ownership: global-DB index when the caller tagged the sketch
        # (search windows — non-owned refs may be marker-only stubs whose
        # seeds live on the owning host), else the list position
        self.owner_dev = [
            getattr(s, "_mh_owner_key", g) % self.n_dev
            for g, s in enumerate(self.refs)]
        self.local = {d.id: d for d in devices
                      if d.process_index == self.pid}
        shard_refs = {i: [] for i in self.local}
        self.local_idx = {i: [] for i in self.local}
        for g, s in enumerate(self.refs):
            d = devices[self.owner_dev[g]]
            if d.id in self.local:
                self.local_idx[d.id].append(g)
                shard_refs[d.id].append(s)
        self.engines = {}
        self.local_slot = {}      # ref global idx -> (device id, local slot)
        for did, refs in shard_refs.items():
            for slot, g in enumerate(self.local_idx[did]):
                self.local_slot[g] = (did, slot)
            self.engines[did] = DevicePairEngine(
                refs + self.queries, sketch_params, command_params,
                model=model, batch=batch, device=self.local[did],
                **engine_kwargs)
        self.n_local_refs = {did: len(refs)
                             for did, refs in shard_refs.items()}
        self.aai = bool(getattr(sketch_params, "use_aa", False))

    def run_pairs(self, pairs) -> List[AniEstResult]:
        """pairs: (ref_global, query_global); every process returns the
        full merged result list."""
        import concurrent.futures as cf

        import jax
        from jax.experimental import multihost_utils

        per_dev = {did: [] for did in self.engines}
        out: List[Optional[AniEstResult]] = [None] * len(pairs)
        for t, (rg, qg) in enumerate(pairs):
            owner = self.local_slot.get(rg)
            if owner is None:
                continue
            did, lr = owner
            per_dev[did].append((t, lr, self.n_local_refs[did] + qg))

        def run(did):
            work = per_dev[did]
            if not work:
                return
            res = self.engines[did].run_pairs(
                [(lr, lq) for _t, lr, lq in work])
            for (t, _lr, _lq), r in zip(work, res):
                out[t] = r

        with cf.ThreadPoolExecutor(max_workers=max(len(self.engines),
                                                   1)) as ex:
            list(ex.map(run, self.engines.keys()))

        if jax.process_count() == 1:
            return out

        # OWNER-COMPACTED merge: each process ships only the rows it
        # owns ([mask | pair_index | numeric fields] per owned pair),
        # padded to the fleet-wide max owned count — which every process
        # derives locally from the deterministic ownership layout, so the
        # merge is ONE allgather of (max_owned, 18) instead of the dense
        # (n_pairs, 17) plane from every process (byte volume scales with
        # owned pairs, ~1/n_procs of the dense plane at balanced loads).
        owner_proc = np.array(
            [self.proc_of_dev[self.owner_dev[rg]] for rg, _qg in pairs],
            dtype=np.int64)
        counts = np.bincount(owner_proc, minlength=self.n_procs)
        width = max(int(counts.max()), 1) if len(pairs) else 1
        mine = np.nonzero(owner_proc == self.pid)[0]
        plane = np.zeros((width, 2 + len(RESULT_FIELDS)), dtype=np.float64)
        row = 0
        for t in mine:
            r = out[t]
            if r is None:
                continue
            plane[row, 0] = 1.0
            plane[row, 1] = float(t)   # exact for any practical n_pairs
            for f, name in enumerate(RESULT_FIELDS):
                plane[row, 2 + f] = float(getattr(r, name))
            row += 1
        self._last_merge_plane_shape = plane.shape  # observability/tests
        gathered = np.asarray(multihost_utils.process_allgather(plane))
        merged = out
        for p in range(gathered.shape[0]):
            if p == self.pid:
                continue
            rows = gathered[p]
            for row in rows[rows[:, 0] == 1.0]:
                t = int(row[1])
                if merged[t] is not None:
                    continue
                rg, qg = pairs[t]
                merged[t] = unpack_result(row[1:], self.refs[rg],
                                          self.queries[qg], self.aai)
        for t in range(len(pairs)):
            if merged[t] is None:
                r = AniEstResult()
                r.ani = float("nan")
                merged[t] = r
        return merged
