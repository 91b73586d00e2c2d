"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh *before* jax is imported anywhere,
so sharding/mesh tests run without TPU hardware (the standard JAX testing
pattern; see SURVEY.md §4).
"""

import os

# The image presets JAX_PLATFORMS=axon (the real TPU tunnel); tests must run
# on the virtual CPU mesh. A pytest plugin imports jax before this conftest
# runs, so env vars are too late — use jax.config (the backend itself is not
# initialized until the first device access, so these still take effect).
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses
# The reference-parity tests (tests/_reference.py) need Keras 2 semantics;
# the flag must be set before any test imports tensorflow.
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Deterministic fp32 matmuls for golden comparisons (the CPU backend's
# default matmul precision is reduced, like the TPU MXU's bf16 path).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_programs():
    """Frees each module's jitted executables after the module finishes.

    Every compiled XLA:CPU program pins JIT code pages; across the full
    suite the process accumulates tens of thousands of memory mappings and
    crosses vm.max_map_count (65530 here), at which point LLVM's mmap fails
    and the NEXT compilation segfaults — reproducibly, in whichever module
    compiles first past the ceiling (observed: the serving worker thread at
    ~test 275; maps measured ~22k at 21% of the suite and climbing).
    Clearing JAX's caches per module releases the mappings (measured
    1009 -> 466 after 60 compiles) at the cost of recompiling small shared
    programs in later modules.
    """
    yield
    import gc

    jax.clear_caches()
    gc.collect()
