"""Pair-executor adapters for the engine drivers.

`tpu_pair_executor` routes pair batches through the device-resident
DevicePairEngine (kernels/device_pipeline.py): sketches are uploaded once,
join/chunk/DP/chain-extraction run on the TPU, and results are finalized via
the native host core.  Selected automatically by engine.get_pair_executor
when an accelerator is present, or forced with SKANI_TPU_EXECUTOR=tpu.

The engine/fleet cache is keyed and validated by SKETCH OBJECT IDENTITY
(`a is b`), never by list id() or dataclass equality: Sketch holds ndarray
fields (== would be ambiguous), and the cache keeps strong references to the
cached sketches, so a live id() can never be reused by a new object.
"""
from __future__ import annotations

from typing import List

from ..ani import AniEstResult

_engine_cache = {}


def _same_sketches(cached, current) -> bool:
    return len(cached) == len(current) and all(
        a is b for a, b in zip(cached, current))


def tpu_pair_executor(ref_sketches, query_sketches, pairs, sketch_params,
                      command_params, model) -> List[AniEstResult]:
    import jax

    from .device_pipeline import DevicePairEngine

    devices = jax.devices()
    if jax.process_count() > 1:
        # multi-HOST runtime (jax.distributed active): cross-process fleet,
        # refs owned round-robin by global device, results allgathered
        from ..multihost import MultiHostPairFleet
        same = ref_sketches is query_sketches
        queries = list(ref_sketches) if same else list(query_sketches)
        fleet = _engine_cache.get("mh_fleet")
        if fleet is None or not _same_sketches(fleet.refs, ref_sketches) \
                or not _same_sketches(fleet.queries, queries):
            fleet = MultiHostPairFleet(list(ref_sketches), queries,
                                       sketch_params, command_params,
                                       model=model)
            _engine_cache.clear()
            _engine_cache["mh_fleet"] = fleet
        return fleet.run_pairs(pairs)
    if len(devices) > 1:
        # multi-device: shard the reference DB across the fleet
        from ..parallel import ShardedPairFleet
        same = ref_sketches is query_sketches
        queries = list(ref_sketches) if same else list(query_sketches)
        fleet = _engine_cache.get("fleet")
        if fleet is None or not _same_sketches(fleet.refs, ref_sketches) \
                or not _same_sketches(fleet.queries, queries):
            fleet = ShardedPairFleet(list(ref_sketches), queries,
                                     sketch_params, command_params,
                                     model=model, devices=devices)
            _engine_cache.clear()
            _engine_cache["fleet"] = fleet
        return fleet.run_pairs(pairs)

    same = ref_sketches is query_sketches
    if same:
        sketches = list(ref_sketches)
        remap = pairs
    else:
        sketches = list(ref_sketches) + list(query_sketches)
        off = len(ref_sketches)
        remap = [(ri, off + qi) for ri, qi in pairs]
    eng = _engine_cache.get("engine")
    if eng is None or not _same_sketches(eng.sketches, sketches):
        eng = DevicePairEngine(sketches, sketch_params, command_params,
                               model=model)
        _engine_cache.clear()
        _engine_cache["engine"] = eng
    eng.model = model
    eng.command_params = command_params
    return eng.run_pairs(remap)
