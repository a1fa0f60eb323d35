"""Pair-executor adapters for the engine drivers.

`tpu_pair_executor` routes pair batches through the device-resident
DevicePairEngine (kernels/device_pipeline.py): sketches are uploaded once,
join/chunk/DP/chain-extraction run on the TPU, and results are finalized via
the native host core.  Selected with SKANI_TPU_EXECUTOR=tpu.
"""
from __future__ import annotations

from typing import List

from ..ani import AniEstResult

_engine_cache = {}


def tpu_pair_executor(ref_sketches, query_sketches, pairs, sketch_params,
                      command_params, model) -> List[AniEstResult]:
    import jax

    from .device_pipeline import DevicePairEngine

    devices = jax.devices()
    if len(devices) > 1:
        # multi-device: shard the reference DB across the fleet
        from ..parallel import ShardedPairFleet
        same = ref_sketches is query_sketches
        queries = list(ref_sketches) if same else list(query_sketches)
        key = ("fleet", id(ref_sketches), id(query_sketches))
        fleet = _engine_cache.get(key)
        if fleet is None or fleet.refs != list(ref_sketches) \
                or fleet.queries != queries:
            fleet = ShardedPairFleet(list(ref_sketches), queries,
                                     sketch_params, command_params,
                                     model=model, devices=devices)
            _engine_cache.clear()
            _engine_cache[key] = fleet
        return fleet.run_pairs(pairs)

    same = ref_sketches is query_sketches
    if same:
        sketches = list(ref_sketches)
        remap = pairs
    else:
        sketches = list(ref_sketches) + list(query_sketches)
        off = len(ref_sketches)
        remap = [(ri, off + qi) for ri, qi in pairs]
    key = (id(ref_sketches), id(query_sketches), len(sketches))
    eng = _engine_cache.get(key)
    if eng is None or eng.sketches != sketches:
        eng = DevicePairEngine(sketches, sketch_params, command_params,
                               model=model)
        _engine_cache.clear()
        _engine_cache[key] = eng
    eng.model = model
    eng.command_params = command_params
    return eng.run_pairs(remap)
