"""Test configuration: force an 8-device virtual CPU platform before JAX import.

Multi-chip sharding tests run against this fake mesh (SURVEY.md section 4's
implication: the reference has no distributed tests; we build them on
`--xla_force_host_platform_device_count`).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The container's sitecustomize force-registers the axon TPU backend and pins
# JAX_PLATFORMS=axon; override at the config level so tests run on the 8-device
# virtual CPU mesh regardless.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Build the native host runtime (libemvm_native.so) once per session when the
# toolchain is available, so the native loader/overlap tests RUN instead of
# skipping. Build failures (missing cmake/ninja/libjpeg) fall back to the
# existing per-test skips -- never fail collection over an optional artifact.
from e2e_multi_view_matching_tpu.data import native_loader  # noqa: E402

if not native_loader.available():
    try:
        native_loader.build()
    except Exception:
        pass


@pytest.fixture
def rng():
    return np.random.default_rng(0)
