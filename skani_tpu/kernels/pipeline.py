"""Batched pair-execution pipeline: host join -> TPU chaining DP -> host stats.

Replaces the reference's rayon pair loop (reference: src/dist.rs:98-143,
src/triangle.rs:71-105) with a device-batched design: the anchor-chunk DP of
MANY genome pairs is packed into shared bucket matrices and executed in a few
lax.scan launches on the TPU; per-pair interval extraction and ANI statistics
stay on the host (small n).
"""
from __future__ import annotations

from typing import List

from ..ani import AniEstResult, calculate_ani
from ..chain import (get_anchors, get_chain_intervals,
                     get_nonoverlapping_chains)
from ..gbdt import predict_from_ani_res
from ..params import map_params_from_sketch
from .chain_tpu import ChainDpTpu

_dp_engine = None


def _engine() -> ChainDpTpu:
    global _dp_engine
    if _dp_engine is None:
        _dp_engine = ChainDpTpu()
    return _dp_engine


def tpu_pair_executor(ref_sketches, query_sketches, pairs, sketch_params,
                      command_params, model,
                      batch_size: int = 256) -> List[AniEstResult]:
    """Compute AniEstResult for each (ref_idx, query_idx) pair."""
    out: List[AniEstResult] = []
    engine = _engine()
    for lo in range(0, len(pairs), batch_size):
        chunk = pairs[lo:lo + batch_size]
        jobs = []
        metas = []
        for ri, qi in chunk:
            ref = ref_sketches[ri]
            q = query_sketches[qi]
            mp = map_params_from_sketch(ref, sketch_params.use_aa,
                                        command_params, model)
            ac, switched = get_anchors(ref, q, mp)
            jobs.append((ac, mp))
            metas.append((ref, q, ac, mp, switched))
        dp_results = engine.run_many(jobs)
        for (ref, q, ac, mp, switched), (scores, ptr) in zip(metas,
                                                             dp_results):
            intervals = get_chain_intervals(ac, scores, ptr, mp)
            good = get_nonoverlapping_chains(intervals, ac.n_chunks)
            res = calculate_ani(good, ref, q, ac, mp, switched)
            if mp.model is not None:
                predict_from_ani_res(res, mp.model)
            out.append(res)
    return out
