"""Test env: force JAX onto CPU with 8 virtual devices BEFORE jax imports.

This is the TPU-world analog of multi-node simulation — multi-chip sharding
semantics (halo exchange, psum'd attention stats, DP) are validated on an
8-device host mesh exactly as they'd run over ICI.
"""
import os
import sys

# Force-override: the session presets JAX_PLATFORMS=axon (the real TPU);
# tests must run on the virtual 8-device CPU mesh. The env var alone is not
# honored once the axon plugin registers, so also pin via jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE, "CODON_X4"))
