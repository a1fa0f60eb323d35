"""Command drivers: sketch / dist / triangle / search.

Orchestration mirrors the reference's L4 drivers (reference: src/sketch.rs,
src/dist.rs, src/triangle.rs, src/search.rs).  Pair execution goes through a
pluggable executor so the batched TPU pipeline (kernels/) can replace the
host reference path transparently.
"""
from __future__ import annotations

import logging
import os
import time
from typing import Dict, List, Optional

from . import db, gbdt, screen, writers
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


def get_pair_executor():
    """Returns the best available pair executor.

    The native per-pair path (C++ join/DP/stats) is the default: on this
    host it outperforms shipping per-pair DP inputs over the accelerator
    link.  The device-batched executor (kernels.pipeline) is selected via
    SKANI_TPU_EXECUTOR=tpu for large batched workloads / multi-chip runs.
    """
    choice = os.environ.get("SKANI_TPU_EXECUTOR", "auto")
    if choice == "tpu":
        from .kernels.pipeline import tpu_pair_executor
        return tpu_pair_executor
    if choice == "numpy":
        return _default_pair_executor
    return _default_pair_executor


def dist(command_params: CommandParams, sketch_params: SketchParams,
         executor=None) -> List[AniEstResult]:
    """reference: src/dist.rs:12-190"""
    t_start = time.monotonic()
    executor = executor or get_pair_executor()
    new_params, ref_sketches = _load_side(
        command_params.ref_files, command_params.refs_are_sketch,
        command_params.individual_contig_r, sketch_params,
        threads=command_params.threads)
    if command_params.refs_are_sketch and new_params != sketch_params:
        log.warning("Parameters from .sketch files not equal to the input "
                    "parameters. Using parameters from .sketch files.")
        sketch_params = new_params
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
    for qj, q in enumerate(query_sketches):
        if index is None:
            for ri, r in enumerate(ref_sketches):
                if screen.check_markers_quickly(
                        q, r, screen_val, command_params.rescue_small):
                    pending_pairs.append((ri, qj))
        else:
            for ri in screen.screen_refs(screen_val, index, q, sketch_params,
                                         command_params.rescue_small):
                pending_pairs.append((int(ri), qj))
        n_done += 1
        if n_done % 100 == 0:
            log.info(f"{n_done} query sequences processed.")
        if n_done % INTERMEDIATE_WRITE_COUNT == 0:
            results = executor(ref_sketches, query_sketches, pending_pairs,
                               sketch_params, command_params, model)
            anis.extend(r for r in results if r.ani > 0.1)
            pending_pairs = []
            writers.write_query_ref_list(
                anis, command_params.out_file_name,
                command_params.max_results, sketch_params.use_aa,
                command_params.est_ci, command_params.detailed_out,
                append=not first_write,
                short_header=command_params.short_header)
            first_write = False
            anis = []
    results = executor(ref_sketches, query_sketches, pending_pairs,
                       sketch_params, command_params, model)
    anis.extend(r for r in results if r.ani > 0.1)
    writers.write_query_ref_list(
        anis, command_params.out_file_name, command_params.max_results,
        sketch_params.use_aa, command_params.est_ci,
        command_params.detailed_out, append=not first_write,
        short_header=command_params.short_header)
    log.info(f"ANI calculation time: {time.monotonic() - t_ani:.2f}s")
    return anis


def triangle(command_params: CommandParams, sketch_params: SketchParams,
             executor=None) -> Dict[int, Dict[int, AniEstResult]]:
    """reference: src/triangle.rs:13-169"""
    t_start = time.monotonic()
    executor = executor or get_pair_executor()
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

    pairs = []
    for i in range(len(ref_sketches) - 1):
        screened = screen.screen_refs(screen_val, index, ref_sketches[i],
                                      sketch_params,
                                      command_params.rescue_small)
        for j in screened:
            if j > i:
                pairs.append((i, int(j)))
    results = executor(ref_sketches, ref_sketches, pairs, sketch_params,
                       command_params, model)
    anis: Dict[int, Dict[int, AniEstResult]] = {}
    for (i, j), r in zip(pairs, results):
        if r.ani > 0.1:
            anis.setdefault(i, {})[j] = r

    if command_params.sparse:
        writers.write_sparse_matrix(
            anis, ref_sketches, command_params.out_file_name,
            sketch_params.use_aa, command_params.est_ci,
            command_params.detailed_out, command_params.diagonal,
            short_header=command_params.short_header)
    else:
        writers.write_phyllip_matrix(
            anis, ref_sketches, command_params.out_file_name,
            command_params.individual_contig_r, command_params.full_matrix,
            command_params.diagonal, sketch_params.use_aa,
            command_params.distance)
    log.info(f"Triangle time: {time.monotonic() - t_start:.2f}s")
    return anis


def search(command_params: CommandParams, executor=None) -> List[AniEstResult]:
    """reference: src/search.rs:16-300"""
    t_start = time.monotonic()
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

    sketch_params, ref_sketches = db.read_markers_bin(ref_marker_file)
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
        db_reader = db.SketchDbReader(folder)
    elif db.has_separate_sketches(folder):
        log.info("Detected separate sketch files format")
    else:
        log.error("No valid sketch database format found in directory")
        raise SystemExit(1)

    kept_refs: Dict[str, Sketch] = {}

    def load_ref(j: int) -> Optional[Sketch]:
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
        if command_params.keep_refs:
            kept_refs[original] = sk
        return sk

    anis: List[AniEstResult] = []
    first_write = True
    n_done = 0
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
        for q in query_sketches:
            if index is None:
                refs_to_try = [j for j, r in enumerate(ref_sketches)
                               if screen.check_markers_quickly(
                                   q, r, screen_val, False)]
            else:
                refs_to_try = [int(j) for j in screen.screen_refs_indices(
                    screen_val, index, q, sketch_params)]
            loaded = [(j, load_ref(j)) for j in refs_to_try]
            loaded = [(j, sk) for j, sk in loaded if sk is not None]
            results = executor([sk for _j, sk in loaded], [q],
                               [(i, 0) for i in range(len(loaded))],
                               sketch_params, command_params, model)
            anis.extend(r for r in results if r.ani > 0.5)
            n_done += 1
            if n_done % 100 == 0:
                log.info(f"{n_done} query sequences processed.")
            if n_done % INTERMEDIATE_WRITE_COUNT == 0:
                writers.write_query_ref_list(
                    anis, command_params.out_file_name,
                    command_params.max_results, sketch_params.use_aa,
                    command_params.est_ci, command_params.detailed_out,
                    append=not first_write,
                    short_header=command_params.short_header)
                first_write = False
                anis = []
    if command_params.keep_refs:
        log.info(f"{len(kept_refs)} references kept in memory for "
                 f"--keep-refs")
    writers.write_query_ref_list(
        anis, command_params.out_file_name, command_params.max_results,
        sketch_params.use_aa, command_params.est_ci,
        command_params.detailed_out, append=not first_write,
        short_header=command_params.short_header)
    log.info(f"Searching time: {time.monotonic() - t_start:.2f}s")
    return anis


def sketch(command_params: CommandParams,
           sketch_params: SketchParams) -> None:
    """reference: src/sketch.rs:15-201"""
    out_dir = command_params.out_file_name
    if os.path.exists(out_dir):
        log.error("Output directory exists; output directory must not be an "
                  "existing directory. Exiting.")
        raise SystemExit(1)
    os.makedirs(out_dir)

    if command_params.separate_sketches:
        if command_params.individual_contig_r:
            log.warning("--separate-sketches combined with -i is NOT "
                        "compatible with `search`.")
        marker_sketches = []
        count = 0
        for f in command_params.ref_files:
            if command_params.individual_contig_r:
                sks = fastx_to_multiple_sketch_rewrite(
                    [f], sketch_params, True, warn=log.warning)
            else:
                sks = fastx_to_sketches([f], sketch_params, True,
                                        warn=log.warning)
            for j, sk in enumerate(sks):
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
        marker_sketches = []
        count = 0
        for f in command_params.ref_files:
            if command_params.individual_contig_r:
                sks = fastx_to_multiple_sketch_rewrite(
                    [f], sketch_params, True, warn=log.warning)
            else:
                sks = fastx_to_sketches([f], sketch_params, True,
                                        warn=log.warning)
            for sk in sks:
                writer.add_sketch(sketch_params, sk)
                marker_sketches.append(sk.get_markers_only())
                count += 1
                if count % 100 == 0:
                    log.info(f"{count} sequences sketched.")
        writer.finalize()
        db.write_markers_bin(os.path.join(out_dir, "markers.bin"),
                             sketch_params, marker_sketches)
        log.info(f"Successfully wrote {count} sketches to consolidated "
                 f"database")
