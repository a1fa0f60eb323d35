"""Command drivers: sketch / dist / triangle / search.

Orchestration mirrors the reference's L4 drivers (reference: src/sketch.rs,
src/dist.rs, src/triangle.rs, src/search.rs).  Pair execution goes through a
pluggable executor so the batched TPU pipeline (kernels/) can replace the
host reference path transparently.
"""
from __future__ import annotations

import logging
import os
import sys
import time
from typing import Dict, List, Optional

from . import db, gbdt, screen, stats, writers
from .ani import AniEstResult, chain_seeds
from .params import (CommandParams, INTERMEDIATE_WRITE_COUNT,
                     LEARNED_INFO_HELP, SEARCH_AAI_CUTOFF_DEFAULT,
                     SEARCH_ANI_CUTOFF_DEFAULT, SketchParams,
                     map_params_from_sketch)
from .sketch import (Sketch, fastx_to_multiple_sketch_rewrite,
                     fastx_to_sketches)

log = logging.getLogger("skani_tpu")


def _make_marker_index(ref_sketches):
    """Marker inverted index — sharded across the device mesh when
    SKANI_TPU_SHARDED=1 (multi-chip DB layout), host CSR index otherwise."""
    if os.environ.get("SKANI_TPU_SHARDED") == "1":
        from .parallel import ShardedMarkerScreen
        return ShardedMarkerScreen(ref_sketches)
    return screen.MarkerIndex(ref_sketches)


def _resolve_screen_val(command_params: CommandParams,
                        sketch_params: SketchParams) -> float:
    if command_params.screen_val == 0.0:
        return (SEARCH_AAI_CUTOFF_DEFAULT if sketch_params.use_aa
                else SEARCH_ANI_CUTOFF_DEFAULT)
    return command_params.screen_val


def _load_side(files: List[str], are_sketch: bool, individual: bool,
               sketch_params: SketchParams, seeder=None, threads: int = 1):
    """Load genomes or sketch files for one side of a comparison.
    Returns (sketch_params, sketches)."""
    if are_sketch:
        params, sketches = db.sketches_from_sketch(files)
        return params, sketches
    if individual:
        return sketch_params, fastx_to_multiple_sketch_rewrite(
            files, sketch_params, True, seeder=seeder, warn=log.warning)
    return sketch_params, fastx_to_sketches(
        files, sketch_params, True, seeder=seeder, warn=log.warning,
        threads=threads)


def _default_pair_executor(ref_sketches, query_sketches, pairs, sketch_params,
                           command_params, model):
    """Host path: one chain_seeds call per (ref_idx, query_idx), fanned out
    over `-t` threads (the reference's rayon pair loop,
    reference: src/dist.rs:98-143).  The native C++ core releases the GIL
    during each call, so threads scale across cores."""
    def one(pair):
        ri, qi = pair
        ref = ref_sketches[ri]
        mp = map_params_from_sketch(ref, sketch_params.use_aa,
                                    command_params, model)
        return chain_seeds(ref, query_sketches[qi], mp)

    threads = getattr(command_params, "threads", 1)
    if threads > 1 and len(pairs) > 8:
        import concurrent.futures as cf
        with cf.ThreadPoolExecutor(max_workers=threads) as ex:
            return list(ex.map(one, pairs))
    return [one(p) for p in pairs]


_accel_backend = None


#: set when the device probe timed out — the backend thread is wedged and
#: interpreter exit must bypass atexit (cli calls hard_exit_if_wedged)
_device_probe_hung = False


def _accelerator_present() -> bool:
    """True when JAX's default backend is an accelerator (TPU or the axon
    tunnel to one).  Cached: jax.devices() initializes the backend once.

    The probe runs on a watchdog thread: an unclaimable/wedged device
    pool HANGS backend init indefinitely (it does not error), and a CLI
    run must degrade to the exact native path instead of hanging — the
    same guard bench.py applies (SKANI_TPU_DEVICE_TIMEOUT_S, default
    300 s, generously above a healthy claim)."""
    global _accel_backend, _device_probe_hung
    if _accel_backend is None:
        import threading
        res = []

        def probe():
            try:
                import jax
                res.append(jax.default_backend() not in ("cpu",))
            except Exception:
                res.append(False)

        t = threading.Thread(target=probe, daemon=True)
        t.start()
        t.join(timeout=float(os.environ.get(
            "SKANI_TPU_DEVICE_TIMEOUT_S", "300")))
        if res:
            _accel_backend = res[0]
        else:
            log.warning("accelerator backend did not come up within the "
                        "probe timeout; using the native executor "
                        "(SKANI_TPU_DEVICE_TIMEOUT_S to adjust)")
            _accel_backend = False
            _device_probe_hung = True
    return _accel_backend


def hard_exit_if_wedged(code: int = 0) -> None:
    """os._exit when the device probe wedged: a thread stuck inside
    backend init can hang interpreter shutdown (atexit backend sync), so
    the CLI exits hard after flushing (mirrors bench.py)."""
    if _device_probe_hung:
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(code)


def _auto_pair_executor(ref_sketches, query_sketches, pairs, sketch_params,
                        command_params, model):
    """Route each batch to the best path: the batched device engine when an
    accelerator is present and the batch is large enough to amortize device
    dispatch, the native per-pair C++ path otherwise.  Both paths are exact
    (enforced by tests/test_executor_equivalence.py), so routing is purely a
    performance decision."""
    from . import multihost
    if multihost.is_active():
        # multi-host runs MUST go through the fleet regardless of batch
        # size or backend: non-owned refs are marker-only stubs whose
        # seeds live on the owning process, so the local per-pair path
        # would silently chain against empty sketches
        from .kernels.pipeline import tpu_pair_executor
        return tpu_pair_executor(ref_sketches, query_sketches, pairs,
                                 sketch_params, command_params, model)
    min_pairs = int(os.environ.get("SKANI_TPU_MIN_PAIRS", "24"))
    if len(pairs) >= min_pairs and _accelerator_present():
        from .kernels.pipeline import tpu_pair_executor
        return tpu_pair_executor(ref_sketches, query_sketches, pairs,
                                 sketch_params, command_params, model)
    return _default_pair_executor(ref_sketches, query_sketches, pairs,
                                  sketch_params, command_params, model)


def get_pair_executor():
    """Returns the best available pair executor.

    Default ("auto"): the device-batched engine (kernels.pipeline) whenever
    an accelerator backend is present and the workload is batched; the
    native per-pair path (C++ join/DP/stats) for small batches and
    CPU-only hosts.  SKANI_TPU_EXECUTOR=tpu forces the device engine,
    =native forces the host path.
    """
    choice = os.environ.get("SKANI_TPU_EXECUTOR", "auto")
    from . import multihost
    if multihost.is_active() and choice in ("native", "numpy"):
        # forced host executors are unusable under a multi-process
        # runtime: non-owned refs are marker-only stubs whose seeds live
        # on the owning process, so local chaining would silently score
        # against empty sketches — route through the fleet instead
        log.warning(f"SKANI_TPU_EXECUTOR={choice} ignored under a "
                    f"multi-process runtime; pairs go through the "
                    f"cross-process fleet.")
        choice = "tpu"
    if choice == "tpu":
        from .kernels.pipeline import tpu_pair_executor
        return tpu_pair_executor
    if choice in ("native", "numpy"):
        return _default_pair_executor
    return _auto_pair_executor


def dist(command_params: CommandParams, sketch_params: SketchParams,
         executor=None) -> List[AniEstResult]:
    """reference: src/dist.rs:12-190"""
    t_start = time.monotonic()
    stats_base = stats.snapshot()
    executor = executor or get_pair_executor()
    with stats.timer("sketch_s"):
        new_params, ref_sketches = _load_side(
            command_params.ref_files, command_params.refs_are_sketch,
            command_params.individual_contig_r, sketch_params,
            threads=command_params.threads)
    if command_params.refs_are_sketch and new_params != sketch_params:
        log.warning("Parameters from .sketch files not equal to the input "
                    "parameters. Using parameters from .sketch files.")
        sketch_params = new_params
    with stats.timer("sketch_s"):
        q_params, query_sketches = _load_side(
            command_params.query_files, command_params.queries_are_sketch,
            command_params.individual_contig_q, sketch_params,
            threads=command_params.threads)
    if command_params.queries_are_sketch and q_params != sketch_params:
        if command_params.refs_are_sketch:
            raise SystemExit("Query sketch parameters were not equal to "
                             "reference sketch parameters. Exiting.")
        log.warning("Parameters from .sketch files not equal to the input "
                    "parameters. Using parameters from .sketch files.")
        sketch_params = q_params
    if not query_sketches or not ref_sketches:
        log.error("No reference sketches/genomes or query sketches/genomes "
                  "found.")
        raise SystemExit(1)

    log.info(f"Generating sketch time: {time.monotonic() - t_start:.2f}s")
    t_ani = time.monotonic()
    screen.check_small_contigs(ref_sketches, query_sketches, log.warning)
    model = gbdt.get_model(sketch_params.c, command_params.learned_ani)
    if model is not None:
        log.info(LEARNED_INFO_HELP)
    screen_val = _resolve_screen_val(command_params, sketch_params)

    index = None
    if command_params.screen:
        log.info("Full index option detected; generating marker hash table")
        index = _make_marker_index(ref_sketches)

    anis: List[AniEstResult] = []
    first_write = True
    n_done = 0
    pending_pairs = []
    # bounded executor batches: screened pairs run in chunks, so memory
    # stays flat for huge query x ref workloads (results still flush to
    # disk every INTERMEDIATE_WRITE_COUNT queries, reference: src/dist.rs)
    pair_batch_cap = int(os.environ.get("SKANI_TPU_DIST_BATCH", "50000"))
    def run_pending():
        nonlocal pending_pairs
        with stats.timer("executor_s"):
            results = executor(ref_sketches, query_sketches, pending_pairs,
                               sketch_params, command_params, model)
        anis.extend(r for r in results if r.ani > 0.1)
        pending_pairs = []

    for qj, q in enumerate(query_sketches):
        with stats.timer("screen_s"):
            if index is None:
                for ri, r in enumerate(ref_sketches):
                    if screen.check_markers_quickly(
                            q, r, screen_val, command_params.rescue_small):
                        pending_pairs.append((ri, qj))
            else:
                for ri in screen.screen_refs(screen_val, index, q,
                                             sketch_params,
                                             command_params.rescue_small):
                    pending_pairs.append((int(ri), qj))
        if len(pending_pairs) >= pair_batch_cap:
            run_pending()
        n_done += 1
        if n_done % 100 == 0:
            log.info(f"{n_done} query sequences processed.")
        if n_done % INTERMEDIATE_WRITE_COUNT == 0:
            run_pending()
            with stats.timer("write_s"):
                writers.write_query_ref_list(
                    anis, command_params.out_file_name,
                    command_params.max_results, sketch_params.use_aa,
                    command_params.est_ci, command_params.detailed_out,
                    append=not first_write,
                    short_header=command_params.short_header)
            first_write = False
            anis = []
    run_pending()
    with stats.timer("write_s"):
        writers.write_query_ref_list(
            anis, command_params.out_file_name, command_params.max_results,
            sketch_params.use_aa, command_params.est_ci,
            command_params.detailed_out, append=not first_write,
            short_header=command_params.short_header)
    log.info(f"ANI calculation time: {time.monotonic() - t_ani:.2f}s")
    log.info(stats.driver_report("dist", time.monotonic() - t_start,
                                 stats_base))
    return anis


def triangle(command_params: CommandParams, sketch_params: SketchParams,
             executor=None) -> Dict[int, Dict[int, AniEstResult]]:
    """reference: src/triangle.rs:13-169"""
    t_start = time.monotonic()
    stats_base = stats.snapshot()
    executor = executor or get_pair_executor()
    with stats.timer("sketch_s"):
        new_params, ref_sketches = _load_side(
            command_params.ref_files, command_params.refs_are_sketch,
            command_params.individual_contig_r, sketch_params,
            threads=command_params.threads)
    if command_params.refs_are_sketch:
        if (new_params.c != sketch_params.c
                or new_params.marker_c != sketch_params.marker_c):
            log.warning("Input sketch parameters differ from the sketch "
                        "files'; using sketch parameters.")
        sketch_params = new_params
    if not ref_sketches:
        log.error("No genomes/sketches found.")
        raise SystemExit(1)
    if len(ref_sketches) > 500 and not command_params.sparse:
        log.warning("> 500 genomes detected. The output matrix will be "
                    "large. Consider using -E or --sparse for a tsv output "
                    "instead.")

    screen_val = _resolve_screen_val(command_params, sketch_params)
    index = _make_marker_index(ref_sketches)
    model = gbdt.get_model(sketch_params.c, command_params.learned_ani)
    if model is not None:
        log.info(LEARNED_INFO_HELP)

    num_rescue = sum(1 for s in ref_sketches if len(s.marker_seeds) < 20)
    if (num_rescue > 1000 and command_params.rescue_small
            and len(ref_sketches) > 2000):
        log.warning("> 1000 genomes with < 20 markers are detected. "
                    "Consider decreasing -m value and/or using "
                    "--faster-small for faster calculations.")

    # Streaming all-vs-all: pairs are generated row by row and executed in
    # bounded batches, and sparse mode flushes accumulated results to disk
    # every INTERMEDIATE_WRITE_COUNT rows (reference: src/triangle.rs:71-138)
    # — memory stays flat at 10k+ genomes instead of materializing all
    # O(n^2) pairs and results at once.
    pair_batch_cap = int(os.environ.get("SKANI_TPU_TRIANGLE_BATCH", "50000"))
    anis: Dict[int, Dict[int, AniEstResult]] = {}
    pending: List = []
    first_write = True

    def run_pending():
        nonlocal pending
        if not pending:
            return
        with stats.timer("executor_s"):
            results = executor(ref_sketches, ref_sketches, pending,
                               sketch_params, command_params, model)
        for (i, j), r in zip(pending, results):
            if r.ani > 0.1:
                anis.setdefault(i, {})[j] = r
        pending = []

    def flush_sparse():
        nonlocal first_write
        with stats.timer("write_s"):
            writers.write_sparse_matrix(
                anis, ref_sketches, command_params.out_file_name,
                sketch_params.use_aa, command_params.est_ci,
                command_params.detailed_out, command_params.diagonal,
                short_header=command_params.short_header,
                append=not first_write)
        first_write = False
        anis.clear()

    for i in range(len(ref_sketches) - 1):
        with stats.timer("screen_s"):
            screened = screen.screen_refs(screen_val, index,
                                          ref_sketches[i], sketch_params,
                                          command_params.rescue_small)
        for j in screened:
            if j > i:
                pending.append((i, int(j)))
        if len(pending) >= pair_batch_cap:
            run_pending()
        if (i + 1) % 100 == 0:
            log.info(f"{i + 1} query sequences processed.")
        if command_params.sparse and (i + 1) % INTERMEDIATE_WRITE_COUNT == 0:
            run_pending()
            flush_sparse()
    run_pending()

    if command_params.sparse:
        flush_sparse()
    else:
        with stats.timer("write_s"):
            writers.write_phyllip_matrix(
                anis, ref_sketches, command_params.out_file_name,
                command_params.individual_contig_r,
                command_params.full_matrix, command_params.diagonal,
                sketch_params.use_aa, command_params.distance)
    log.info(f"Triangle time: {time.monotonic() - t_start:.2f}s")
    log.info(stats.driver_report("triangle", time.monotonic() - t_start,
                                 stats_base))
    return anis


def _iter_query_sketches(command_params: CommandParams,
                         sketch_params: SketchParams):
    """Yield query sketches across all query files (shared by both search
    paths)."""
    for query_file in command_params.query_files:
        if command_params.queries_are_sketch:
            q_params, query_sketches = db.sketches_from_sketch([query_file])
            if q_params != sketch_params and "markers.bin" not in query_file:
                log.warning(f"Query sketch parameters for {query_file} not "
                            f"equal to reference sketch parameters; no ANI "
                            f"calculated")
        elif command_params.individual_contig_q:
            query_sketches = fastx_to_multiple_sketch_rewrite(
                [query_file], sketch_params, True, warn=log.warning)
        else:
            query_sketches = fastx_to_sketches(
                [query_file], sketch_params, True, warn=log.warning)
        yield from query_sketches


_resident_engines: Dict = {}   # (db identity, page key) -> DevicePairEngine


def _search_device_resident(command_params: CommandParams,
                            sketch_params: SketchParams,
                            ref_sketches, db_reader, model, index,
                            screen_val,
                            folder: str = "") -> Optional[List[AniEstResult]]:
    """Upload-once device-resident `search`: the whole reference DB (or
    HBM-budget pages of it) is uploaded ONCE as a DeviceDb and stays
    resident; query batches stream through reserved rows via device-side
    row scatters (DeviceDb.update_rows), so per-query device traffic is
    O(query), not O(screened refs).  The TPU-native analog of the
    reference's markers-resident + mmap-lazy-sketch architecture
    (reference: src/search.rs:37-95, src/sketch_db.rs:84-123).

    Returns None when ineligible (multi-host, no consolidated DB, no
    accelerator, or disabled via SKANI_TPU_SEARCH_RESIDENT=0) — the
    caller then runs the windowed executor path."""
    if os.environ.get("SKANI_TPU_SEARCH_RESIDENT", "1") != "1":
        return None
    from . import multihost
    if multihost.is_active() or db_reader is None:
        return None
    forced = os.environ.get("SKANI_TPU_EXECUTOR")
    if forced in ("native", "numpy"):
        return None
    if forced != "tpu" and not _accelerator_present():
        return None
    from .ani import chain_seeds
    from .kernels.device_pipeline import DevicePairEngine

    n_refs = len(ref_sketches)
    budget = int(os.environ.get("SKANI_TPU_SEARCH_HBM_MB", "4096")) << 20
    # page partition by on-disk sketch size (device bytes ~ 1.3-2x the
    # bincode bytes; the 2x factor leaves pad-to-max headroom).  When the
    # DB exceeds one budget, pages are sized at budget/2 so at least two
    # pages co-reside under the LRU — consecutive mega-windows touching
    # the same pages then pay zero re-upload instead of thrashing.
    ests = [2 * db_reader.index[j][1] for j in range(n_refs)]
    total_est = sum(ests)
    page_kb = os.environ.get("SKANI_TPU_SEARCH_PAGE_KB")
    if page_kb:                      # explicit page granularity (tests)
        page_budget = int(page_kb) << 10
    else:
        page_budget = budget if total_est <= budget else budget // 2
    pages: List[List[int]] = []
    page_bytes: List[int] = []
    cur: List[int] = []
    acc = 0
    for j in range(n_refs):
        est = ests[j]
        if cur and acc + est > page_budget:
            pages.append(cur)
            page_bytes.append(acc)
            cur, acc = [], 0
        cur.append(j)
        acc += est
    if cur:
        pages.append(cur)
        page_bytes.append(acc)
    page_of = {}
    for pi, page in enumerate(pages):
        for j in page:
            page_of[j] = pi
    log.info(f"Device-resident search: {n_refs} references in "
             f"{len(pages)} page(s)")

    q_slots = int(os.environ.get("SKANI_TPU_SEARCH_QSLOTS", "64"))
    threads = command_params.threads
    try:
        db_id = (os.path.realpath(folder),
                 os.path.getmtime(os.path.join(folder, "sketches.db")))
    except OSError:
        db_id = (os.path.realpath(folder), 0.0)

    n_page_uploads = 0

    def load_page(pi: int) -> DevicePairEngine:
        """Page engines persist ACROSS search() calls (module cache keyed
        on the DB file identity): repeat searches against the same DB pay
        zero re-upload.  Multiple pages stay resident under an LRU bounded
        by the HBM budget (pages are sized at budget/2 when the DB spans
        more than one), so a DB up to 2x the budget never re-uploads."""
        nonlocal n_page_uploads
        # q_slots is part of the identity: a cached engine reserved fewer
        # query rows than a later call chunks by would scatter past the
        # device table (silently dropped) and then index out of range
        key = (db_id, pi, len(pages), q_slots)
        eng = _resident_engines.get(key)
        if eng is not None:
            _resident_engines.pop(key)          # LRU move-to-end
            _resident_engines[key] = eng
            eng.command_params = command_params
            eng.model = model
            return eng
        page = pages[pi]

        def one(j):
            _p, sk = db_reader.get_sketch(j)
            return sk

        with stats.timer("load_s"):
            if threads > 1 and len(page) > 3:
                import concurrent.futures as cf
                with cf.ThreadPoolExecutor(max_workers=threads) as ex:
                    refs = list(ex.map(one, page))
            else:
                refs = [one(j) for j in page]
        # evict least-recently-used pages until the new one fits
        resident = sum(getattr(e, "_hbm_est", budget)
                       for e in _resident_engines.values())
        while _resident_engines and resident + page_bytes[pi] > budget:
            _k, old = next(iter(_resident_engines.items()))
            resident -= getattr(old, "_hbm_est", budget)
            del _resident_engines[_k], old
        eng = DevicePairEngine(refs, sketch_params, command_params,
                               model=model, reserved_slots=q_slots)
        eng._hbm_est = page_bytes[pi]
        _resident_engines[key] = eng
        n_page_uploads += 1
        return eng

    anis: List[AniEstResult] = []
    first_write = True
    n_done = 0

    def flush(final: bool = False):
        nonlocal first_write, anis
        with stats.timer("write_s"):
            writers.write_query_ref_list(
                anis, command_params.out_file_name,
                command_params.max_results, sketch_params.use_aa,
                command_params.est_ci, command_params.detailed_out,
                append=not first_write,
                short_header=command_params.short_header)
        first_write = False
        if not final:
            anis = []

    def run_mega(queries, per_query_refs):
        """Score one mega-window of queries against every page they hit."""
        by_page: Dict[int, List] = {}
        for qi, refs_to_try in enumerate(per_query_refs):
            for j in refs_to_try:
                by_page.setdefault(page_of[j], []).append((j, qi))
        # resident pages first: with the LRU this makes the page schedule
        # across consecutive windows ...,A,B | B,A,... so the boundary
        # page never re-uploads
        resident = {k[1] for k in _resident_engines
                    if k[0] == db_id and k[2] == len(pages)
                    and k[3] == q_slots}
        for pi in sorted(by_page, key=lambda p: (p not in resident, p)):
            eng = load_page(pi)
            page = pages[pi]
            local = {j: s for s, j in enumerate(page)}
            pair_list = by_page[pi]
            # queries stream through the reserved rows in chunks
            by_query: Dict[int, List[int]] = {}
            for j, qi in pair_list:
                by_query.setdefault(qi, []).append(j)
            q_ids = sorted(by_query)
            for c0 in range(0, len(q_ids), q_slots):
                chunk = q_ids[c0:c0 + q_slots]
                slots = [eng.reserved_base + k for k in range(len(chunk))]
                if eng.load_slots(slots, [queries[qi] for qi in chunk]):
                    pairs = [(local[j], slot)
                             for qi, slot in zip(chunk, slots)
                             for j in by_query[qi]]
                    with stats.timer("executor_s"):
                        results = eng.run_pairs(pairs)
                else:
                    # oversized queries: exact host path against the
                    # already-resident full ref sketches
                    results = []
                    for qi in chunk:
                        q = queries[qi]
                        for j in by_query[qi]:
                            ref = eng.sketches[local[j]]
                            mp = map_params_from_sketch(
                                ref, sketch_params.use_aa, command_params,
                                model)
                            results.append(chain_seeds(ref, q, mp))
                anis.extend(r for r in results if r.ani > 0.5)

    # queries buffer only until enough screened pairs accumulate to fill
    # device batches (same bound as the windowed path) — NOT until the
    # 5000-query write flush: holding thousands of full query sketches
    # would grow RSS with query-set size where the windowed path stays
    # flat per window
    mega_cap = int(os.environ.get("SKANI_TPU_SEARCH_BATCH", "4096"))
    # when the DB exceeds the LRU capacity, every window still pays
    # (pages - resident) uploads — amortize them over proportionally
    # larger windows (bounded: queries held are full sketches)
    lru_capacity = max(1, budget // page_budget)
    excess_pages = max(0, len(pages) - lru_capacity)
    if excess_pages:
        mega_cap *= min(8, 1 + excess_pages)
    queries: List[Sketch] = []
    per_query_refs: List[List[int]] = []
    n_pend = 0
    for q in _iter_query_sketches(command_params, sketch_params):
        with stats.timer("screen_s"):
            if index is None:
                refs_to_try = [j for j, r in enumerate(ref_sketches)
                               if screen.check_markers_quickly(
                                   q, r, screen_val, False)]
            else:
                refs_to_try = [int(j) for j in screen.screen_refs_indices(
                    screen_val, index, q, sketch_params)]
        queries.append(q)
        per_query_refs.append(refs_to_try)
        n_pend += len(refs_to_try)
        n_done += 1
        if n_pend >= mega_cap:
            run_mega(queries, per_query_refs)
            queries, per_query_refs, n_pend = [], [], 0
        if n_done % 100 == 0:
            log.info(f"{n_done} query sequences processed.")
        if n_done % INTERMEDIATE_WRITE_COUNT == 0:
            run_mega(queries, per_query_refs)
            queries, per_query_refs, n_pend = [], [], 0
            flush()
    run_mega(queries, per_query_refs)
    flush(final=True)
    log.info(f"Device-resident search: {n_page_uploads} page upload(s) "
             f"across {len(pages)} page(s)")
    return anis


def search(command_params: CommandParams, executor=None) -> List[AniEstResult]:
    """reference: src/search.rs:16-300"""
    t_start = time.monotonic()
    stats_base = stats.snapshot()
    executor = executor or get_pair_executor()
    ref_marker_file = ""
    for f in command_params.ref_files:
        if ("markers.bin" in f):
            ref_marker_file = f
        elif ".sketch" not in f and "marker" not in f \
                and not f.endswith("db"):
            log.warning(f"{f} does not have .sketch as an extension; "
                        f"skipping file")
    if not ref_marker_file:
        log.error("markers.bin not found in the folder. Ensure that the "
                  "folder was generated by `skani-tpu sketch`.")
        raise SystemExit(1)

    # corrupt/truncated databases hard-error with a clean message, like
    # the reference (src/search.rs:92-95), instead of a raw traceback
    try:
        sketch_params, ref_sketches = db.read_markers_bin(ref_marker_file)
    except db.CorruptDbError as e:
        log.error(str(e))
        raise SystemExit(1)
    screen_val = _resolve_screen_val(command_params, sketch_params)
    learned_ani = gbdt.use_learned_ani(
        sketch_params.c, command_params.individual_contig_q, False,
        command_params.median) and command_params.learned_ani
    model = gbdt.get_model(sketch_params.c, learned_ani)
    if model is not None:
        log.info(LEARNED_INFO_HELP)

    index = None
    if command_params.screen:
        log.info("Full index option detected; generating marker hash table")
        index = _make_marker_index(ref_sketches)

    folder = os.path.dirname(ref_marker_file) or "."
    db_reader = None
    if db.is_consolidated_db(folder):
        log.info("Detected consolidated sketch database format")
        try:
            db_reader = db.SketchDbReader(folder)
        except db.CorruptDbError as e:
            log.error(str(e))
            raise SystemExit(1)
    elif db.has_separate_sketches(folder):
        log.info("Detected separate sketch files format")
    else:
        log.error("No valid sketch database format found in directory")
        raise SystemExit(1)

    res = _search_device_resident(command_params, sketch_params,
                                  ref_sketches, db_reader, model, index,
                                  screen_val, folder=folder)
    if res is not None:
        log.info(f"Searching time: {time.monotonic() - t_start:.2f}s")
        log.info(stats.driver_report("search", time.monotonic() - t_start,
                                     stats_base))
        return res

    kept_refs: Dict[str, Sketch] = {}

    # Multi-host runtime: each host loads ONLY the sketches it owns from
    # the consolidated DB (mmap offsets make the slice read cheap) and
    # passes marker-only stubs for the rest — their seeds live on the
    # owning host, which scores those pairs; results merge in the fleet.
    # Sketches are tagged with their global DB index so ownership is
    # consistent across the window-local ref lists.
    from . import multihost
    mh_pid = None
    if multihost.is_active():
        import jax
        mh_pid = jax.process_index()
        manifest = db.read_shard_manifest(folder)
        if manifest and manifest.get("n_shards") != jax.process_count():
            log.warning(
                f"Shard manifest was written for "
                f"{manifest.get('n_shards')} hosts; running with "
                f"{jax.process_count()} processes (round-robin "
                f"ownership still applies).")
    if mh_pid is not None:
        for j, r in enumerate(ref_sketches):
            r._mh_owner_key = j

    def load_ref(j: int) -> Optional[Sketch]:
        from .multihost import owner_process
        if mh_pid is not None and owner_process(j) != mh_pid:
            return ref_sketches[j]     # marker-only stub (metadata)
        original = ref_sketches[j].file_name
        if command_params.keep_refs and original in kept_refs:
            return kept_refs[original]
        if db_reader is not None:
            _p, sk = db_reader.get_sketch(j)
        else:
            path = os.path.join(
                folder, os.path.basename(original) + ".sketch")
            _p, sks = db.sketches_from_sketch([path])
            if not sks:
                return None
            sk = sks[0]
        sk._mh_owner_key = j
        if command_params.keep_refs:
            kept_refs[original] = sk
        return sk

    def load_refs(js: List[int]):
        """Load the passing reference sketches, in parallel over `-t`
        threads (reference: src/search.rs:142-166 par_iter over passing
        refs).  Lazy mmap deserialization is read-only, so concurrent loads
        are safe; --keep-refs hits are served from the cache."""
        threads = command_params.threads
        if threads > 1 and len(js) > 3:
            import concurrent.futures as cf
            with cf.ThreadPoolExecutor(max_workers=threads) as ex:
                sks = list(ex.map(load_ref, js))
        else:
            sks = [load_ref(j) for j in js]
        return [(j, sk) for j, sk in zip(js, sks) if sk is not None]

    # Queries are batched across the executor: screened (query, ref) pairs
    # accumulate into a window that is executed as ONE batch, so the device
    # engine sees large pair batches (and uploads each window's DB once)
    # instead of a per-query trickle.  Both paths are exact, so windowing
    # never changes results — only throughput.
    anis: List[AniEstResult] = []
    first_write = True
    n_done = 0
    batch_cap = int(os.environ.get("SKANI_TPU_SEARCH_BATCH", "4096"))
    win_refs: List[Sketch] = []
    win_slot: Dict[int, int] = {}   # ref index -> slot in win_refs
    win_queries: List[Sketch] = []
    win_pairs: List = []

    def run_window():
        nonlocal win_refs, win_slot, win_queries, win_pairs
        if win_pairs:
            with stats.timer("executor_s"):
                results = executor(win_refs, win_queries, win_pairs,
                                   sketch_params, command_params, model)
            anis.extend(r for r in results if r.ani > 0.5)
        win_refs, win_slot, win_queries, win_pairs = [], {}, [], []

    for q in _iter_query_sketches(command_params, sketch_params):
        with stats.timer("screen_s"):
            if index is None:
                refs_to_try = [j for j, r in enumerate(ref_sketches)
                               if screen.check_markers_quickly(
                                   q, r, screen_val, False)]
            else:
                refs_to_try = [int(j) for j in
                               screen.screen_refs_indices(
                                   screen_val, index, q, sketch_params)]
        qslot = len(win_queries)
        win_queries.append(q)
        with stats.timer("load_s"):
            loaded = load_refs([j for j in refs_to_try
                                if j not in win_slot])
        for j, sk in loaded:
            win_slot[j] = len(win_refs)
            win_refs.append(sk)
        win_pairs.extend((win_slot[j], qslot) for j in refs_to_try
                         if j in win_slot)
        if len(win_pairs) >= batch_cap:
            run_window()
        n_done += 1
        if n_done % 100 == 0:
            log.info(f"{n_done} query sequences processed.")
        if n_done % INTERMEDIATE_WRITE_COUNT == 0:
            run_window()
            with stats.timer("write_s"):
                writers.write_query_ref_list(
                    anis, command_params.out_file_name,
                    command_params.max_results, sketch_params.use_aa,
                    command_params.est_ci, command_params.detailed_out,
                    append=not first_write,
                    short_header=command_params.short_header)
            first_write = False
            anis = []
    run_window()
    if command_params.keep_refs:
        log.info(f"{len(kept_refs)} references kept in memory for "
                 f"--keep-refs")
    with stats.timer("write_s"):
        writers.write_query_ref_list(
            anis, command_params.out_file_name, command_params.max_results,
            sketch_params.use_aa, command_params.est_ci,
            command_params.detailed_out, append=not first_write,
            short_header=command_params.short_header)
    log.info(f"Searching time: {time.monotonic() - t_start:.2f}s")
    log.info(stats.driver_report("search", time.monotonic() - t_start,
                                 stats_base))
    return anis


def _sketch_stream(files: List[str], sketch_params: SketchParams,
                   individual: bool, threads: int, warn):
    """Producer-consumer sketching pipeline: up to `threads` files are
    sketched concurrently (the seeding kernel releases the GIL, so producer
    threads scale across cores) and (index_within_file, sketch) items are
    yielded in deterministic file order through a bounded window — the
    analog of the reference's rayon producers -> bounded sync_channel ->
    single writer design (reference: src/sketch.rs:105-190), with the
    window bound playing the channel-capacity role so a 65k-genome build
    streams instead of materializing every sketch."""
    def one(f):
        if individual:
            sks = fastx_to_multiple_sketch_rewrite([f], sketch_params, True,
                                                   warn=warn)
        else:
            sks = fastx_to_sketches([f], sketch_params, True, warn=warn)
        return list(enumerate(sks))

    if threads <= 1 or len(files) <= 1:
        for f in files:
            yield from one(f)
        return
    import collections
    import concurrent.futures as cf
    with cf.ThreadPoolExecutor(max_workers=threads) as ex:
        window = collections.deque()
        for f in files:
            window.append(ex.submit(one, f))
            if len(window) >= 2 * threads:
                yield from window.popleft().result()
        while window:
            yield from window.popleft().result()


def sketch(command_params: CommandParams,
           sketch_params: SketchParams) -> None:
    """reference: src/sketch.rs:15-201"""
    out_dir = command_params.out_file_name
    if os.path.exists(out_dir):
        log.error("Output directory exists; output directory must not be an "
                  "existing directory. Exiting.")
        raise SystemExit(1)
    os.makedirs(out_dir)

    stream = _sketch_stream(command_params.ref_files, sketch_params,
                            command_params.individual_contig_r,
                            command_params.threads, log.warning)
    marker_sketches = []
    count = 0
    if command_params.separate_sketches:
        if command_params.individual_contig_r:
            log.warning("--separate-sketches combined with -i is NOT "
                        "compatible with `search`.")
        for j, sk in stream:
            base = os.path.basename(sk.file_name)
            if command_params.individual_contig_r:
                name = os.path.join(out_dir, f"{j}_{base}.sketch")
            else:
                name = os.path.join(out_dir, f"{base}.sketch")
            db.write_sketch_file(name, sketch_params, sk)
            marker_sketches.append(sk.get_markers_only())
            count += 1
            if count % 100 == 0:
                log.info(f"{count} sequences sketched.")
        db.write_markers_bin(os.path.join(out_dir, "markers.bin"),
                             sketch_params, marker_sketches)
    else:
        writer = db.SketchDbWriter(out_dir)
        for _j, sk in stream:
            writer.add_sketch(sketch_params, sk)
            marker_sketches.append(sk.get_markers_only())
            count += 1
            if count % 100 == 0:
                log.info(f"{count} sequences sketched.")
        writer.finalize()
        db.write_markers_bin(os.path.join(out_dir, "markers.bin"),
                             sketch_params, marker_sketches)
        if command_params.shards > 0:
            db.write_shard_manifest(out_dir, command_params.shards)
            log.info(f"Shard manifest written for {command_params.shards} "
                     f"hosts")
        log.info(f"Successfully wrote {count} sketches to consolidated "
                 f"database")
