"""Command-line interface mirroring the reference's flag surface
(reference: src/cli.rs, arg resolution: src/parse.rs:502-1016).
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

from .params import (CommandParams, DEFAULT_C, DEFAULT_C_AAI, DEFAULT_K,
                     DEFAULT_K_AAI, D_FRAC_COVER_CUTOFF,
                     D_FRAC_COVER_CUTOFF_AA, FAST_C, FULL_INDEX_THRESH,
                     MARKER_C_DEFAULT, MEDIUM_C, Mode, SLOW_C, SMALL_M,
                     SketchParams)
from . import gbdt

log = logging.getLogger("skani_tpu")


def _add_common_misc(p):
    p.add_argument("-t", dest="threads", default="3",
                   help="Number of threads")
    p.add_argument("-v", "--debug", action="store_true",
                   help="Debug level verbosity")
    p.add_argument("--trace", action="store_true",
                   help="Trace level verbosity")


def _add_presets(p, small_genomes=True):
    p.add_argument("--slow", action="store_true",
                   help="Slower mode; alias for -c 30")
    p.add_argument("--medium", action="store_true",
                   help="Medium mode; alias for -c 70")
    p.add_argument("--fast", action="store_true",
                   help="Faster mode; alias for -c 200")
    if small_genomes:
        p.add_argument("--small-genomes", action="store_true",
                       dest="small_genomes",
                       help="Mode for small genomes; alias for "
                            "-c 30 -m 200 --faster-small")


def _add_sketch_knobs(p):
    p.add_argument("-a", "--aai", action="store_true",
                   help=argparse.SUPPRESS)
    p.add_argument("-k", default=None, help=argparse.SUPPRESS)
    p.add_argument("-c", default=None,
                   help="Compression factor (k-mer subsampling rate). "
                        "[default: 125]")
    p.add_argument("-m", dest="marker_c", default=None,
                   help="Marker k-mer compression factor. [default: 1000]")


def _add_out_flags(p):
    p.add_argument("-o", dest="output", default=None,
                   help="Output file name [default: stdout]")
    p.add_argument("--min-af", dest="min_af", default=None,
                   help="Only output if one genome has aligned fraction > "
                        "this value. [default: 15]")
    p.add_argument("--both-min-af", dest="both_min_af", default=None,
                   help="Only output if both genomes have aligned fraction "
                        "> this value. [default: disabled]")
    p.add_argument("--ci", action="store_true",
                   help="Output [5%%,95%%] ANI confidence intervals")
    p.add_argument("--detailed", action="store_true",
                   help="Print additional info")
    p.add_argument("--short-header", dest="short_header",
                   action="store_true",
                   help="Only display contig name before first whitespace")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="skani-tpu",
        description="fast, robust ANI calculation and database searching "
                    "for metagenomic contigs and assemblies — TPU-native.")
    sub = ap.add_subparsers(dest="command", required=True)

    ps = sub.add_parser("sketch", help="Sketch (index) genomes.")
    _add_common_misc(ps)
    ps.add_argument("fasta_files", nargs="*", help="fastas to sketch")
    ps.add_argument("-l", dest="fasta_list", default=None,
                    help="File with one fasta/sketch file per line")
    ps.add_argument("-i", dest="individual_contig", action="store_true",
                    help="Use individual sequences instead of whole files")
    ps.add_argument("-o", dest="output", required=True,
                    help="Output folder for sketches")
    ps.add_argument("--separate-sketches", dest="separate_sketches",
                    action="store_true",
                    help="Write separate .sketch files instead of a "
                         "consolidated database")
    ps.add_argument("--shards", dest="shards", type=int, default=0,
                    help="Record a shard manifest for an N-host fleet in "
                         "the consolidated database (TPU multi-host "
                         "extension; no effect on single-host use)")
    _add_presets(ps, small_genomes=False)
    _add_sketch_knobs(ps)

    pd = sub.add_parser("dist", help="Compute ANI of queries vs references.")
    _add_common_misc(pd)
    pd.add_argument("query", nargs="?", default=None)
    pd.add_argument("reference", nargs="*", default=[])
    pd.add_argument("-q", dest="queries", nargs="+", default=[])
    pd.add_argument("-r", dest="references", nargs="+", default=[])
    pd.add_argument("--rl", dest="reference_list", default=None)
    pd.add_argument("--ql", dest="query_list", default=None)
    pd.add_argument("--qi", action="store_true")
    pd.add_argument("--ri", action="store_true")
    pd.add_argument("-n", default=None,
                    help="Max results per query [default: unlimited]")
    _add_out_flags(pd)
    _add_presets(pd)
    _add_sketch_knobs(pd)
    pd.add_argument("-s", default=None,
                    help="Screen out pairs with approx < %% identity "
                         "[default: 80]")
    pd.add_argument("--no-learned-ani", dest="no_learned_ani",
                    action="store_true")
    pd.add_argument("--robust", action="store_true")
    pd.add_argument("--median", action="store_true")
    pd.add_argument("--no-marker-index", dest="no_marker_index",
                    action="store_true")
    pd.add_argument("--faster-small", dest="faster_small",
                    action="store_true")

    pt = sub.add_parser("triangle", help="All-to-all ANI/AF matrix.")
    _add_common_misc(pt)
    pt.add_argument("fasta_files", nargs="*")
    pt.add_argument("-l", dest="fasta_list", default=None)
    pt.add_argument("-i", dest="individual_contig", action="store_true")
    _add_out_flags(pt)
    pt.add_argument("--full-matrix", dest="full_matrix", action="store_true")
    pt.add_argument("--diagonal", action="store_true")
    pt.add_argument("--distance", action="store_true")
    pt.add_argument("-E", "--sparse", action="store_true")
    _add_presets(pt)
    _add_sketch_knobs(pt)
    pt.add_argument("-s", default=None)
    pt.add_argument("--no-learned-ani", dest="no_learned_ani",
                    action="store_true")
    pt.add_argument("--robust", action="store_true")
    pt.add_argument("--median", action="store_true")
    pt.add_argument("--faster-small", dest="faster_small",
                    action="store_true")

    pq = sub.add_parser("search", help="Search queries against a database.")
    _add_common_misc(pq)
    pq.add_argument("-d", dest="database", required=True,
                    help="Output folder from `skani-tpu sketch`")
    pq.add_argument("query", nargs="*", default=[])
    pq.add_argument("-q", dest="queries", nargs="+", default=[])
    pq.add_argument("--ql", dest="query_list", default=None)
    pq.add_argument("--qi", action="store_true")
    pq.add_argument("-n", default=None)
    _add_out_flags(pq)
    pq.add_argument("-s", default=None)
    pq.add_argument("--no-learned-ani", dest="no_learned_ani",
                    action="store_true")
    pq.add_argument("--keep-refs", dest="keep_refs", action="store_true")
    pq.add_argument("--no-marker-index", dest="no_marker_index",
                    action="store_true")
    pq.add_argument("--robust", action="store_true")
    pq.add_argument("--median", action="store_true")
    return ap


def _setup_logging(args):
    level = logging.INFO
    if getattr(args, "debug", False):
        level = logging.DEBUG
    if getattr(args, "trace", False):
        logging.addLevelName(5, "TRACE")
        level = 5   # TRACE: per-fragment estimator dumps (ani.py)
    logging.basicConfig(stream=sys.stderr, level=level,
                        format="%(levelname)s [%(asctime)s] - %(message)s")


def _read_file_list(path: str):
    with open(path) as f:
        return [line.strip() for line in f]


def _resolve_ckm(args, amino_acid: bool):
    """Preset precedence (reference: src/parse.rs:561-581,682-710)."""
    k = int(args.k) if args.k else (DEFAULT_K_AAI if amino_acid
                                    else DEFAULT_K)
    c = int(args.c) if args.c else (DEFAULT_C_AAI if amino_acid
                                    else DEFAULT_C)
    marker_c = int(args.marker_c) if args.marker_c else MARKER_C_DEFAULT
    if getattr(args, "fast", False) and getattr(args, "slow", False):
        raise SystemExit("Both --slow and --fast were set. Not allowed.")
    if getattr(args, "fast", False):
        if args.c:
            log.warning("-c value is set but --fast is also set. Using "
                        "--fast mode instead (-c 200)")
        c = FAST_C
    if getattr(args, "slow", False):
        if args.c:
            log.warning("-c value is set but --slow is also set. Using "
                        "--slow mode instead (-c 30)")
        c = SLOW_C
    if getattr(args, "medium", False):
        if args.c:
            log.warning("-c value is set but --medium is also set. Using "
                        "--medium mode instead (-c 70)")
        c = MEDIUM_C
    if getattr(args, "small_genomes", False):
        if args.c or args.marker_c:
            log.warning("-c or -m value is set but --small-genomes is also "
                        "set. Using -c 30 and -m 200 instead.")
        c = SLOW_C
        marker_c = SMALL_M
    return c, k, marker_c


def _are_sketch(files, allow_marker=True) -> bool:
    if not files:
        return False
    for f in files:
        if ".sketch" in f or "markers.bin" in f:
            continue
        if allow_marker and ".marker" in f:
            continue
        return False
    return True


def _maf(args, amino_acid: bool, default_for_search=False) -> float:
    if args.min_af is not None:
        return float(args.min_af) / 100.0
    if default_for_search:
        return -100.0 / 100.0
    return (D_FRAC_COVER_CUTOFF_AA if amino_acid
            else D_FRAC_COVER_CUTOFF) / 100.0


def parse_args_to_params(args):
    """argparse namespace -> (SketchParams, CommandParams)."""
    cmd = args.command
    if cmd == "sketch":
        amino_acid = args.aai
        c, k, marker_c = _resolve_ckm(args, amino_acid)
        files = args.fasta_files or (
            _read_file_list(args.fasta_list) if args.fasta_list else [])
        if not files:
            raise SystemExit("No reference inputs found.")
        sp = SketchParams(c=c, k=k, marker_c=marker_c, use_aa=amino_acid)
        cp = CommandParams(
            mode=Mode.SKETCH, out_file_name=args.output, ref_files=files,
            refs_are_sketch=_are_sketch(files),
            individual_contig_r=args.individual_contig,
            min_aligned_frac=0.0, both_min_aligned_frac=-0.01,
            max_results=1 << 62, separate_sketches=args.separate_sketches,
            rescue_small=False, learned_ani=False, shards=args.shards)
        return sp, cp

    if cmd == "dist":
        amino_acid = args.aai
        rescue_small = not args.faster_small and not args.small_genomes
        ref_files = (args.reference or args.references
                     or (_read_file_list(args.reference_list)
                         if args.reference_list else []))
        if not ref_files:
            raise SystemExit("No reference inputs found.")
        query_files = []
        if args.query:
            query_files.append(args.query)
        query_files.extend(args.queries)
        if args.query_list:
            query_files.extend(_read_file_list(args.query_list))
        c, k, marker_c = _resolve_ckm(args, amino_acid)
        sp = SketchParams(c=c, k=k, marker_c=marker_c, use_aa=amino_acid)
        screen = ((len(query_files) > FULL_INDEX_THRESH or args.qi)
                  and not args.no_marker_index)
        learned = (not args.no_learned_ani
                   and gbdt.use_learned_ani(c, args.qi, args.ri, args.median))
        cp = CommandParams(
            mode=Mode.DIST, screen=screen,
            screen_val=(float(args.s) if args.s else 0.0) / 100.0,
            out_file_name=args.output or "", ref_files=ref_files,
            query_files=query_files,
            refs_are_sketch=_are_sketch(ref_files),
            queries_are_sketch=_are_sketch(query_files, allow_marker=False),
            robust=args.robust, median=args.median,
            max_results=int(args.n) if args.n else 10 ** 12,
            individual_contig_q=args.qi, individual_contig_r=args.ri,
            min_aligned_frac=_maf(args, amino_acid),
            both_min_aligned_frac=(float(args.both_min_af)
                                   if args.both_min_af else -1.0) / 100.0,
            est_ci=args.ci, learned_ani=learned,
            detailed_out=args.detailed, rescue_small=rescue_small,
            short_header=args.short_header)
        return sp, cp

    if cmd == "triangle":
        amino_acid = args.aai
        rescue_small = not args.faster_small and not args.small_genomes
        files = args.fasta_files or (
            _read_file_list(args.fasta_list) if args.fasta_list else [])
        if not files:
            raise SystemExit("No reference inputs found.")
        c, k, marker_c = _resolve_ckm(args, amino_acid)
        sp = SketchParams(c=c, k=k, marker_c=marker_c, use_aa=amino_acid)
        learned = (not args.no_learned_ani
                   and gbdt.use_learned_ani(c, args.individual_contig,
                                            args.individual_contig,
                                            args.median))
        cp = CommandParams(
            mode=Mode.TRIANGLE, screen=True,
            screen_val=(float(args.s) if args.s else 0.0) / 100.0,
            out_file_name=args.output or "", ref_files=files,
            refs_are_sketch=_are_sketch(files),
            robust=args.robust, median=args.median, sparse=args.sparse,
            full_matrix=args.full_matrix, diagonal=args.diagonal,
            max_results=1 << 62,
            individual_contig_q=args.individual_contig,
            individual_contig_r=args.individual_contig,
            min_aligned_frac=_maf(args, amino_acid),
            both_min_aligned_frac=(float(args.both_min_af)
                                   if args.both_min_af else -1.0) / 100.0,
            est_ci=args.ci, learned_ani=learned,
            detailed_out=args.detailed, distance=args.distance,
            rescue_small=rescue_small, short_header=args.short_header)
        return sp, cp

    if cmd == "search":
        query_files = list(args.query) + list(args.queries)
        if args.query_list:
            query_files.extend(_read_file_list(args.query_list))
        try:
            ref_files = [os.path.join(args.database, f)
                         for f in os.listdir(args.database)]
        except OSError:
            raise SystemExit(
                "Issue with folder specified by -d option; exiting")
        screen = ((len(query_files) > FULL_INDEX_THRESH or args.qi)
                  and not args.no_marker_index)
        cp = CommandParams(
            mode=Mode.SEARCH, screen=screen,
            screen_val=(float(args.s) if args.s else 0.0) / 100.0,
            out_file_name=args.output or "", ref_files=ref_files,
            query_files=query_files, refs_are_sketch=True,
            queries_are_sketch=_are_sketch(query_files, allow_marker=False),
            robust=args.robust, median=args.median,
            max_results=int(args.n) if args.n else 10 ** 7,
            individual_contig_q=args.qi,
            min_aligned_frac=_maf(args, False, default_for_search=True),
            both_min_aligned_frac=-0.01, keep_refs=args.keep_refs,
            est_ci=args.ci, learned_ani=not args.no_learned_ani,
            detailed_out=args.detailed, rescue_small=False,
            short_header=args.short_header)
        if not cp.ref_files:
            raise SystemExit("No valid reference fastas or sketches found.")
        return SketchParams(), cp

    raise SystemExit(f"unknown command {cmd}")


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    _setup_logging(args)
    # reference: src/main.rs:25-32 (invocation logged, truncated to 250)
    log.info("skani-tpu %s", " ".join(argv if argv is not None
                                      else sys.argv[1:])[:250])
    sp, cp = parse_args_to_params(args)
    cp.threads = max(int(args.threads), 1)
    # multi-host launch (SKANI_TPU_COORDINATOR et al.): form the global
    # device mesh before any other jax use; the pair executor then routes
    # through the cross-process fleet automatically
    from . import multihost
    if multihost.init_from_env():
        import jax
        log.info(f"jax.distributed: process {jax.process_index()} of "
                 f"{jax.process_count()}, {len(jax.devices())} devices")
        if jax.process_index() != 0:
            # every process holds the full merged results; host 0 writes
            cp.out_file_name = os.devnull
    from . import engine
    if cp.mode == Mode.SKETCH:
        engine.sketch(cp, sp)
    elif cp.mode == Mode.DIST:
        engine.dist(cp, sp)
    elif cp.mode == Mode.TRIANGLE:
        engine.triangle(cp, sp)
    elif cp.mode == Mode.SEARCH:
        engine.search(cp)
    # a wedged device pool leaves a thread stuck inside backend init;
    # results are already written, so exit hard rather than hang atexit
    engine.hard_exit_if_wedged(0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
