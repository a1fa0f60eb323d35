#!/usr/bin/env bash
# Release gate: capture the full test log + benchmark line for the current
# version under test_results_versions/<version>/ — the analog of the
# reference's scripts/pre_release.sh golden run logs per release.
set -euo pipefail
cd "$(dirname "$0")/.."

VERSION=$(python - <<'EOF'
import tomllib
print(tomllib.load(open("pyproject.toml", "rb"))["project"]["version"])
EOF
)
OUT="test_results_versions/${VERSION}"
mkdir -p "$OUT"

# version-string consistency (pyproject vs package)
PKG_VERSION=$(python -c "import skani_tpu; print(skani_tpu.__version__)")
if [ "$VERSION" != "$PKG_VERSION" ]; then
    echo "version mismatch: pyproject=$VERSION package=$PKG_VERSION" >&2
    exit 1
fi

echo "capturing test log for v${VERSION} -> ${OUT}/"
# tests on the CPU backend (the CI configuration); bench on the real
# accelerator (whatever jax selects by default on this host)
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python -m pytest tests/ -q -rA 2>&1 | tee "${OUT}/test_log.txt"
# tests against the REAL accelerator backend: the compiled device kernels
# (Pallas DP, MXU gathers, packed readbacks) are only exercised here —
# round 2 shipped a TPU-red fuzz test because this gate ran CPU-only.
# Both configurations must pass (tests/conftest.py contract).
python -m pytest tests/test_device_engine.py tests/test_dp_pallas.py \
    tests/test_gather_pallas.py tests/test_dp_compact.py \
    tests/test_device_fuzz.py tests/test_kernel_contracts.py \
    tests/test_executor_equivalence.py -q -rA 2>&1 \
    | tee "${OUT}/test_log_accel.txt"
python bench.py 2>/dev/null | tee "${OUT}/bench.json"
echo "done: $(date -u +%Y-%m-%dT%H:%M:%SZ)" | tee -a "${OUT}/test_log.txt"
