"""Test harness setup: hermetic CPU JAX with a virtual 8-device mesh.

Must run before the first ``import jax`` anywhere in the test session.
"""

import os

# Hard-set: the shell environment pins JAX_PLATFORMS to the TPU platform,
# but the test suite must be hermetic on CPU with a virtual 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The machine's sitecustomize force-registers the TPU backend and overrides
# jax_platforms to "axon,cpu" at import time; pin it back to CPU before any
# backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")


@pytest.fixture(autouse=True, scope="module")
def _bound_compiled_executable_accumulation():
    """Clear jit caches between test modules.

    The full 285-test suite accumulates hundreds of compiled XLA:CPU
    executables in one process; under that allocator pressure the XLA CPU
    compiler was observed to SEGFAULT on a late big search-step compile
    (flaky, position-dependent — r3).  Dropping executables at module
    boundaries bounds the high-water mark; modules mostly retrace anyway
    (different tiny models), so the runtime cost is small.
    """
    yield
    import gc

    jax.clear_caches()
    gc.collect()
