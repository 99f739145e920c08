"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-device tests use the standard JAX fake-backend trick
(``--xla_force_host_platform_device_count``) so the pmap/pjit paths are
exercised without TPU hardware (SURVEY.md §4c).

NOTE: this environment's site hook imports jax at interpreter startup, so
``JAX_PLATFORMS`` from the shell is already consumed; the platform must be
switched via ``jax.config`` instead (XLA_FLAGS is still read lazily at
first backend init, so setting it here is in time).
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# tests never touch the tunnel backend: skip __graft_entry__'s relay
# liveness probe (240 s when the relay is down)
os.environ["MILLIEYE_SKIP_PROBE"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: this box has ONE cpu core and the suite is
# dominated by repeated XLA compiles of the fusion graphs; warm reruns
# skip them. Separate dir from the TPU cache (.jax_cache) — XLA:CPU AOT
# entries are machine-specific.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound in-process compiler-state accumulation (full-suite segfault
    guard).

    The full suite reproducibly SEGFAULTED inside XLA:CPU
    ``backend_compile`` (LLVM JIT) at one of the big interpret-Pallas
    stem graphs — but only after ~35 modules' worth of compiled
    executables accumulated in the pjit cache; every file passes alone
    and either half of the suite + the stem file crashes the same way
    (runs/seg_bisect.log). Dropping the in-memory executable caches at
    module boundaries keeps the accumulation bounded; recompiles are
    absorbed by the persistent ``.jax_cache_cpu``."""
    yield
    jax.clear_caches()
