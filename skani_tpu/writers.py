"""Output writers — byte-compatible with the reference's TSV / PHYLIP formats
(reference: src/file_io.rs:15-139,364-678).
"""
from __future__ import annotations

import io
import math
import sys
from typing import Dict, List

import numpy as np

from .ani import AniEstResult


def _f32(x) -> np.float32:
    return np.float32(x)


def fmt2(x) -> str:
    """Rust {:.2} on an f32 value."""
    return f"{float(_f32(x)):.2f}"


def disp_f32(x) -> str:
    """Rust {} (Display) of an f32: shortest round-trip decimal."""
    return np.format_float_positional(_f32(x), unique=True, trim="-")


def truncate_contig_name(name: str, short_header: bool) -> str:
    """reference: src/types.rs:197-203"""
    if short_header:
        parts = name.split()
        return parts[0] if parts else name
    return name


def write_header(out, id_str: str, ci: bool, verbose: bool) -> None:
    """reference: src/file_io.rs:15-23"""
    if not ci and not verbose:
        out.write(f"Ref_file\tQuery_file\t{id_str}\tAlign_fraction_ref\t"
                  f"Align_fraction_query\tRef_name\tQuery_name\n")
    elif not verbose:
        out.write(f"Ref_file\tQuery_file\t{id_str}\tAlign_fraction_ref\t"
                  f"Align_fraction_query\tRef_name\tQuery_name\t"
                  f"{id_str}_5_percentile\t{id_str}_95_percentile\n")
    else:
        out.write(f"Ref_file\tQuery_file\t{id_str}\tAlign_fraction_ref\t"
                  f"Align_fraction_query\tRef_name\tQuery_name\t"
                  f"Num_ref_contigs\tNum_query_contigs\t"
                  f"{id_str}_5_percentile\t{id_str}_95_percentile\t"
                  f"Standard_deviation\t"
                  f"Ref_90_ctg_len\tRef_50_ctg_len\tRef_10_ctg_len\t"
                  f"Query_90_ctg_len\tQuery_50_ctg_len\tQuery_10_ctg_len\t"
                  f"Avg_chain_len\tTotal_bases_covered\n")


def write_ani_res(out, r: AniEstResult, ci: bool, verbose: bool,
                  short_header: bool) -> None:
    """reference: src/file_io.rs:83-139"""
    ani = float(_f32(r.ani) * _f32(100.0))
    af_r = float(_f32(r.align_fraction_ref) * _f32(100.0))
    af_q = float(_f32(r.align_fraction_query) * _f32(100.0))
    rn = truncate_contig_name(r.ref_contig, short_header)
    qn = truncate_contig_name(r.query_contig, short_header)
    base = (f"{r.ref_file}\t{r.query_file}\t{ani:.2f}\t{af_r:.2f}\t"
            f"{af_q:.2f}\t{rn}\t{qn}")
    if not ci and not verbose:
        out.write(base + "\n")
    elif not verbose:
        lo = float(_f32(r.ci_lower) * _f32(100.0))
        hi = float(_f32(r.ci_upper) * _f32(100.0))
        out.write(base + f"\t{lo:.2f}\t{hi:.2f}\n")
    else:
        lo = float(_f32(r.ci_lower) * _f32(100.0))
        hi = float(_f32(r.ci_upper) * _f32(100.0))
        std = float(_f32(r.std) * _f32(100.0))
        out.write(base + f"\t{r.num_contigs_r}\t{r.num_contigs_q}\t"
                  f"{lo:.2f}\t{hi:.2f}\t{std:.2f}\t"
                  f"{disp_f32(r.quant_90_contig_len_r)}\t"
                  f"{disp_f32(r.quant_50_contig_len_r)}\t"
                  f"{disp_f32(r.quant_10_contig_len_r)}\t"
                  f"{disp_f32(r.quant_90_contig_len_q)}\t"
                  f"{disp_f32(r.quant_50_contig_len_q)}\t"
                  f"{disp_f32(r.quant_10_contig_len_q)}\t"
                  f"{r.avg_chain_int_len}\t{r.total_bases_covered}\n")


def write_ani_res_perfect(out, sketch, ci: bool, verbose: bool,
                          short_header: bool) -> None:
    """Synthesized self-comparison row (reference: src/file_io.rs:25-81).
    NOTE: Rust ignores {:.2} precision on integer literals, so these print
    '100' not '100.00'; preserved."""
    name = truncate_contig_name(sketch.contigs[0], short_header)
    base = (f"{sketch.file_name}\t{sketch.file_name}\t100\t100\t100\t"
            f"{name}\t{name}")
    if not ci and not verbose:
        out.write(base + "\n")
    elif not verbose:
        out.write(base + "\t100\t100\n")
    else:
        out.write(base + f"\t{len(sketch.contigs)}\t{len(sketch.contigs)}\t"
                  f"100\t100\t0\t-1\t-1\t-1\t-1\t-1\t-1\t0\t"
                  f"{sketch.total_sequence_length}\n")


def _open_out(file_name: str, append: bool):
    if not file_name:
        return sys.stdout, False
    return open(file_name, "a" if append else "w"), True


def write_query_ref_list(anis: List[AniEstResult], file_name: str, n: int,
                         aai: bool, est_ci: bool, detailed_out: bool,
                         append: bool = False,
                         short_header: bool = False) -> None:
    """reference: src/file_io.rs:608-678 (group by query contig, sort each
    group by descending ANI, emit top n)."""
    id_str = "AAI" if aai else "ANI"
    groups: Dict[str, List[AniEstResult]] = {}
    for r in anis:
        if r.ani < 0 or math.isnan(r.ani):
            continue
        groups.setdefault(r.query_contig, []).append(r)
    out, close = _open_out(file_name, append)
    try:
        if not append:
            write_header(out, id_str, est_ci, detailed_out)
        for key in sorted(groups):
            rows = sorted(groups[key], key=lambda r: -_f32(r.ani))
            for r in rows[:n]:
                write_ani_res(out, r, est_ci, detailed_out, short_header)
    finally:
        if close:
            out.close()


def write_sparse_matrix(anis: Dict[int, Dict[int, AniEstResult]],
                        sketches: List, file_name: str, aai: bool,
                        est_ci: bool, detailed_out: bool, diag: bool,
                        append: bool = False,
                        short_header: bool = False) -> None:
    """reference: src/file_io.rs:541-606"""
    id_str = "AAI" if aai else "ANI"
    out, close = _open_out(file_name, append)
    try:
        if not append:
            write_header(out, id_str, est_ci, detailed_out)
        if diag:
            for sk in sketches:
                write_ani_res_perfect(out, sk, est_ci, detailed_out,
                                      short_header)
        for i in sorted(anis):
            for j in sorted(anis[i]):
                r = anis[i][j]
                if not (r.ani == -1.0 or math.isnan(r.ani)):
                    write_ani_res(out, r, est_ci, detailed_out, short_header)
    finally:
        if close:
            out.close()


def write_phyllip_matrix(anis: Dict[int, Dict[int, AniEstResult]],
                         sketches: List, file_name: str,
                         use_contig_names: bool, full_matrix: bool,
                         diag: bool, aai: bool, distance: bool) -> None:
    """PHYLIP-style ANI matrix + always-full .af AF matrix
    (reference: src/file_io.rs:364-539)."""
    perfect = 0.0 if distance else 100.0
    none = 100.0 - perfect

    def lookup(i, j):
        x, y = min(i, j), max(i, j)
        if x not in anis or y not in anis[x]:
            return None
        r = anis[x][y]
        if r.ani == -1.0 or math.isnan(r.ani):
            return None
        return r

    def name_of(i):
        return (sketches[i].contigs[0] if use_contig_names
                else sketches[i].file_name)

    ani_out = io.StringIO()
    af_out = io.StringIO()
    nsk = len(sketches)
    ani_out.write(f"{nsk}\n")
    af_out.write(f"{nsk}\n")
    to_file = bool(file_name)
    for i in range(nsk):
        ani_out.write(name_of(i))
        af_out.write(name_of(i))
        for j in range(nsk):
            # ANI matrix cell policy differs stdout vs file in the reference;
            # both reduce to: emit cell iff full_matrix or j < i (+ diagonal
            # when diag), stdout stops the row at `end`.
            if to_file:
                full_cond = full_matrix or (i > j)
                if i == j:
                    if full_cond or diag:
                        ani_out.write(f"\t{perfect:.2f}")
                    af_out.write("\t100.00")
                    continue
                r = lookup(i, j)
                if full_cond:
                    if r is None:
                        ani_out.write(f"\t{none:.2f}")
                    else:
                        val = float(_f32(r.ani) * _f32(100.0))
                        v = val if not distance else 100.0 - val
                        ani_out.write(f"\t{v:.2f}")
                _write_af_cell(af_out, r, i, j)
            else:
                end = nsk if full_matrix else (i + 1 if diag else i)
                if j < end:
                    if i == j:
                        ani_out.write(f"\t{perfect:.2f}")
                    else:
                        r = lookup(i, j)
                        if r is None:
                            ani_out.write(f"\t{none:.2f}")
                        else:
                            val = float(_f32(r.ani) * _f32(100.0))
                            v = val if not distance else 100.0 - val
                            ani_out.write(f"\t{v:.2f}")
                if i == j:
                    af_out.write("\t100.00")
                else:
                    _write_af_cell(af_out, lookup(i, j), i, j)
        ani_out.write("\n")
        af_out.write("\n")

    if to_file:
        with open(file_name, "w") as f:
            f.write(ani_out.getvalue())
        with open(file_name + ".af", "w") as f:
            f.write(af_out.getvalue())
    else:
        sys.stdout.write(ani_out.getvalue())
        with open("skani_matrix.af", "w") as f:
            f.write(af_out.getvalue())


def _write_af_cell(af_out, r, i, j):
    if r is None:
        af_out.write("\t0.00")
        return
    if j > i:
        v = float(_f32(r.align_fraction_ref) * _f32(100.0))
    else:
        v = float(_f32(r.align_fraction_query) * _f32(100.0))
    af_out.write(f"\t{v:.2f}")
