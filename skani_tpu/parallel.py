"""Multi-chip / multi-host sharding: the sketch DB distributed over a mesh.

The reference is single-node shared-memory only (reference: SURVEY §2); this
module supplies the distributed layer the TPU build adds:

* the sketch database's small broadcastable state (marker sets) is sharded
  across the 'db' mesh axis, one genome-slice per device (per host in a pod
  slice);
* queries are replicated; each shard computes shared-marker counts for its
  genomes with an exact 42-bit lexicographic binary search (markers split
  into u32 pairs — TPU-friendly, no 64-bit emulation);
* per-shard counts are merged with an all_gather over the mesh axis (ICI
  within a host's chips, DCN across hosts);
* the screening cutoff (reference: src/screen.rs:148-189) is then applied
  and only screened-in genomes proceed to chaining — on the shard that owns
  them (DevicePairEngine) or via the host runtime.

Works on any jax device set: real TPU slices, or a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=N) for testing.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .params import K_MARKER_AA, K_MARKER_DNA

_MASK21 = np.uint64((1 << 21) - 1)


def _split_u42(markers: np.ndarray):
    """Split sorted 42-bit marker values into sorted (hi, lo) u32 pairs."""
    hi = (markers >> np.uint64(21)).astype(np.uint32)
    lo = (markers & _MASK21).astype(np.uint32)
    return hi, lo


class ShardedMarkerScreen:
    """Marker screening over a device mesh with the DB sharded by genome."""

    def __init__(self, sketches: Sequence, devices: Optional[list] = None):
        devices = devices if devices is not None else jax.devices()
        self.n_dev = len(devices)
        self.mesh = Mesh(np.array(devices), ("db",))
        self.sketches = list(sketches)
        G = len(sketches)
        # pad genome count to a multiple of the mesh size
        Gp = ((G + self.n_dev - 1) // self.n_dev) * self.n_dev
        M = max(max((len(s.marker_seeds) for s in sketches), default=1), 1)
        hi = np.full((Gp, M), np.uint32(0xFFFFFFFF), dtype=np.uint32)
        lo = np.full((Gp, M), np.uint32(0xFFFFFFFF), dtype=np.uint32)
        n_markers = np.zeros(Gp, dtype=np.int32)
        for g, s in enumerate(sketches):
            m = len(s.marker_seeds)
            if m:
                h, l = _split_u42(s.marker_seeds)
                hi[g, :m] = h
                lo[g, :m] = l
            n_markers[g] = m
        self.G, self.Gp, self.M = G, Gp, M
        shard = NamedSharding(self.mesh, P("db"))
        self.db_hi = jax.device_put(jnp.asarray(hi), shard)
        self.db_lo = jax.device_put(jnp.asarray(lo), shard)
        self.marker_counts = n_markers[:G].astype(np.int64)

    # duck-typing with screen.MarkerIndex so screen_refs()/screen_refs_indices()
    # work against a sharded DB transparently
    @property
    def n_sketches(self) -> int:
        return self.G

    def counts_for(self, query_markers: np.ndarray) -> np.ndarray:
        return self.counts(query_markers)

    def counts(self, query_markers: np.ndarray) -> np.ndarray:
        """Shared-marker counts of one query against every DB genome."""
        Q = max(len(query_markers), 1)
        q_hi = np.full(Q, np.uint32(0xFFFFFFFF), dtype=np.uint32)
        q_lo = np.full(Q, np.uint32(0xFFFFFFFF), dtype=np.uint32)
        if len(query_markers):
            h, l = _split_u42(query_markers)
            q_hi[:len(h)] = h
            q_lo[:len(l)] = l
        repl = NamedSharding(self.mesh, P())
        qh = jax.device_put(jnp.asarray(q_hi), repl)
        ql = jax.device_put(jnp.asarray(q_lo), repl)
        counts = _sharded_counts(self.mesh)(self.db_hi, self.db_lo, qh, ql)
        return np.asarray(counts)[:self.G].astype(np.int64)

    def screen(self, query_sketch, identity: float, use_aa: bool,
               rescue_small: bool) -> np.ndarray:
        """Indices of DB genomes passing the screen
        (reference: src/screen.rs:148-189)."""
        if len(query_sketch.marker_seeds) < 20 and rescue_small:
            return np.arange(self.G)
        counts = self.counts(query_sketch.marker_seeds)
        k = K_MARKER_AA if use_aa else K_MARKER_DNA
        cutoff = identity ** k
        qn = len(query_sketch.marker_seeds)
        cut = np.maximum(
            (cutoff * np.minimum(self.marker_counts, qn)).astype(np.int64),
            1)
        return np.nonzero(counts > cut)[0]


class ShardedPairFleet:
    """The full pair pipeline over a device fleet: reference sketches are
    sharded by genome (one DevicePairEngine + DeviceDb slice per device),
    queries are replicated, and each pair is scored on the device that owns
    its reference.  Engines run concurrently from host threads (JAX dispatch
    is asynchronous; threads only block on per-batch readbacks).

    This is the production layout for `search` against a large DB on a pod
    slice: markers (ShardedMarkerScreen) prefilter with collectives; the
    surviving (query, ref) pairs route here.  Works on a virtual CPU mesh
    for testing.
    """

    def __init__(self, ref_sketches: Sequence, query_sketches: Sequence,
                 sketch_params, command_params, model=None,
                 devices: Optional[list] = None, batch: int = 32,
                 **engine_kwargs):
        devices = devices if devices is not None else jax.devices()
        self.n_dev = len(devices)
        self.refs = list(ref_sketches)
        self.queries = list(query_sketches)
        nq = len(self.queries)
        self.owner = []          # ref global idx -> (device slot, local idx)
        shard_refs = [[] for _ in range(self.n_dev)]
        for g, s in enumerate(self.refs):
            d = g % self.n_dev
            self.owner.append((d, len(shard_refs[d])))
            shard_refs[d].append(s)
        from .kernels.device_pipeline import DevicePairEngine
        self.engines = []
        for d in range(self.n_dev):
            local = shard_refs[d] + self.queries
            self.engines.append(DevicePairEngine(
                local, sketch_params, command_params, model=model,
                batch=batch, device=devices[d], **engine_kwargs))
        self.n_local_refs = [len(s) for s in shard_refs]

    def run_pairs(self, pairs):
        """pairs: (ref_global, query_global) index pairs; returns results in
        input order.

        Assignment: a pair runs on the device owning its REF shard — the
        only device with that ref's seeds.  When refs and queries are the
        SAME genomes (triangle), every genome is also replicated as a
        query on every device, so pairs round-robin freely instead: this
        removes the triangle-ownership imbalance (ref 0 appears in n-1
        i<j pairs, the last ref in none) that the scaling probe exposed."""
        import concurrent.futures as cf

        same = (len(self.refs) == len(self.queries)
                and all(a is b for a, b in zip(self.refs, self.queries)))
        per_dev = [[] for _ in range(self.n_dev)]
        for t, (rg, qg) in enumerate(pairs):
            if same:
                d = t % self.n_dev
                per_dev[d].append((t, self.n_local_refs[d] + rg,
                                   self.n_local_refs[d] + qg))
            else:
                d, lr = self.owner[rg]
                per_dev[d].append((t, lr, self.n_local_refs[d] + qg))
        out = [None] * len(pairs)

        def run(d):
            work = per_dev[d]
            if not work:
                return
            res = self.engines[d].run_pairs([(lr, lq) for _t, lr, lq in work])
            for (t, _lr, _lq), r in zip(work, res):
                out[t] = r

        with cf.ThreadPoolExecutor(max_workers=self.n_dev) as ex:
            list(ex.map(run, range(self.n_dev)))
        return out


@functools.lru_cache(maxsize=4)
def _sharded_counts(mesh):
    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P("db"), P("db"), P(), P()),
                       out_specs=P(), check_vma=False)
    def f(db_hi, db_lo, q_hi, q_lo):
        # membership of each DB marker in the sorted query list: exact
        # lexicographic binary search on (hi, lo) u32 pairs
        Gl, M = db_hi.shape
        Q = q_hi.shape[0]
        tgt_h = db_hi.reshape(-1)
        tgt_l = db_lo.reshape(-1)
        lo_b = jnp.zeros(tgt_h.shape, jnp.int32)
        hi_b = jnp.full(tgt_h.shape, Q, jnp.int32)
        steps = int(np.ceil(np.log2(max(Q, 2)))) + 1
        for _ in range(steps):
            mid = (lo_b + hi_b) // 2
            midc = jnp.clip(mid, 0, Q - 1)
            ch = q_hi[midc]
            cl = q_lo[midc]
            lt = (ch < tgt_h) | ((ch == tgt_h) & (cl < tgt_l))
            lt &= mid < Q
            lo_b = jnp.where(lt, mid + 1, lo_b)
            hi_b = jnp.where(lt, hi_b, mid)
        pos = jnp.clip(lo_b, 0, Q - 1)
        found = (q_hi[pos] == tgt_h) & (q_lo[pos] == tgt_l) \
            & (tgt_h != jnp.uint32(0xFFFFFFFF))
        local = found.reshape(Gl, M).sum(axis=1).astype(jnp.int32)
        return jax.lax.all_gather(local, "db", tiled=True)
    return jax.jit(f)
