import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Backend note: on hosts with a tunneled accelerator (PALLAS_AXON_POOL_IPS
# set), the site hook forces the axon backend regardless of JAX_PLATFORMS,
# so in-process tests exercise the REAL device kernels (Pallas DP, MXU
# gathers) — the strongest form of the equivalence suite.  Run
#   env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest tests/
# to exercise the CPU fallbacks (lax.scan DP, XLA flat gathers) instead;
# both configurations must pass.  Subprocess-based tests (parallel /
# multihost / streaming) always unset the pool var themselves because they
# need multi-device virtual CPU meshes.

TEST_FILES = "/root/reference/test_files"


def fixture_path(name: str) -> str:
    return os.path.join(TEST_FILES, name)
