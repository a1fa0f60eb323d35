#!/usr/bin/env bash
# Round-3 TPU runlist: everything that was blocked on the unclaimable axon
# pool, in PRIORITY order (most decision-relevant first, in case the pool
# window is short).  Run SERIALLY on the 1-core host (concurrent
# suites/benches contaminate each other).  Each step logs under
# .runlist_logs/ and failures don't stop later steps (|| true) — except
# step 0, which gates everything (no point burning hours against a pool
# that is still unclaimable).
#
# Usage: scripts/round3_tpu_runlist.sh [step ...]   (default: all)
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p .runlist_logs
STEPS=${@:-0 1 2 3 4 5 6}

run() {  # run <name> <timeout-s> <cmd...>
    local name=$1 tmo=$2; shift 2
    echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a .runlist_logs/runlist.log
    timeout "$tmo" "$@" > ".runlist_logs/$name.log" 2>&1 || \
        echo "!! $name exited $? (see .runlist_logs/$name.log)" \
            | tee -a .runlist_logs/runlist.log
}

for s in $STEPS; do case $s in
0)  # claim probe: a tiny jit + readback must complete
    timeout 300 python -c "
import jax, numpy as np, jax.numpy as jnp
print(jax.devices()); assert np.asarray(jnp.arange(4)+1)[3] == 4" \
        || { echo 'pool unclaimable; aborting runlist'; exit 1; } ;;
1)  # primary bench A/Bs in information order (decide the default config
    # from these; the first run pays the phase_a recompile, ~5-20 min/shape
    # on the tunnel, cached after)
    SKANI_TPU_COMPACT_DP=1 run bench_compact 7200 python bench.py
    run bench_base 7200 python bench.py
    SKANI_TPU_COMPACT_DP=1 SKANI_TPU_MERGE_READ=4 \
        run bench_compact_merge4 7200 python bench.py
    SKANI_TPU_COMPACT_DP=1 SKANI_TPU_MERGE_READ=4 SKANI_TPU_MERGE_PUT=8 \
        run bench_compact_merge4_put8 7200 python bench.py
    SKANI_TPU_MERGE_READ=4 SKANI_TPU_MERGE_PUT=8 \
        run bench_merge4_put8 7200 python bench.py ;;
2)  # release gate: CPU suite + accel suite + bench -> test_results_versions/
    # (run AFTER flipping defaults from step-1 results)
    run pre_release 14400 bash scripts/pre_release.sh ;;
3)  # stage profiles + secondary bench A/Bs
    run profile_base 7200 python scripts/profile_phase_a.py 3
    SKANI_TPU_COMPACT_DP=1 \
        run profile_compact 7200 python scripts/profile_phase_a.py 3
    SKANI_TPU_FUSED_REGROUP=1 \
        run profile_fused 7200 python scripts/profile_phase_a.py 3
    SKANI_TPU_FUSED_REGROUP=1 run bench_fused 7200 python bench.py
    SKANI_TPU_BATCH=64 BENCH_GENOMES=32 run bench_b64 7200 python bench.py
    SKANI_TPU_LCAP=256 run bench_l256 7200 python bench.py
    SKANI_TPU_COMPACT_DP=1 SKANI_TPU_INFLIGHT=6 \
        run bench_compact_deep 7200 python bench.py ;;
4)  # dense-join budget crossover (VERDICT weak #7)
    run dense_crossover 7200 python scripts/dense_join_crossover.py ;;
5)  # MAG-scale pair on device (VERDICT missing #4); wide-tier compact A/B
    run mag_demo 10800 python scripts/mag_scale_demo.py
    SKANI_TPU_COMPACT_DP=1 \
        run mag_demo_compact 10800 python scripts/mag_scale_demo.py ;;
6)  # 65k-genome search on the device-resident path (DB already built)
    SKANI_SCALE_PHASE=search \
        BENCH_DB_GENOMES=65000 BENCH_DB_GENOME_LEN=150000 \
        run search65k 10800 python scripts/search_scale_demo.py .scale65k ;;
esac; done
echo "runlist done $(date -u)" | tee -a .runlist_logs/runlist.log
