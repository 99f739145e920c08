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


# Tests measured >=10 s on this box (runs/pytest_durations.log) carry a
# `slow` marker, added centrally here so the fast gate
# `python -m pytest tests/ -m "not slow"` (~8 min vs ~21) stays usable
# as a pre-commit check; the FULL suite remains the record of truth.
_SLOW = {
    "test_stem_pallas.py::test_serving_preset_pallas_pair2_builds_and_runs",
    "test_fusion_net.py::test_training_step_grads",
    "test_learning.py::test_stage3_radar_branch_learns",
    "test_stem_pallas.py::test_fused_stem2_s2d_deep_pair_channels",
    "test_export.py::test_export_roundtrip_matches_live_graph",
    "test_mixed_precision.py::test_heads_dtype_bf16_close_to_f32",
    "test_roi_align.py::test_fusion_roi_impl_pallas_matches_einsum",
    "test_fusion_net.py::test_max_det_truncation_exact",
    "test_export.py::test_export_cli",
    "test_stem_pallas.py::test_serving_preset_pallas_max_builds_and_runs",
    "test_ckpt_parity.py::test_checkpoint_parity_random_sd",
    "test_int8_act.py::test_full_net_int8_acts_close_and_heads_skipped",
    "test_trainer_loop.py::test_fusion_training_loop_and_eval",
    "test_fusion_net.py::test_forward_modes",
    "test_stem_pallas.py::test_darknet_pallas_stem_matches_plain",
    "test_parallel.py::test_dryrun_multichip_dp_tp",
    "test_ckpt_schema.py::test_fusion_network_exact_key_schema",
    "test_stem_pallas.py::test_fused_stem2_s2d_matches_two_stages",
    "test_cli_serving.py::test_evaluate_cli_serving",
    "test_fusion_net.py::test_refine_network_module2",
    "test_io.py::test_fill_fusion_network_and_forward",
    "test_darknet.py::test_full_yolov3_topology_and_shapes",
    "test_mixed_precision.py::test_f16_store_keeps_dim_precision",
    "test_e2e_parity.py::test_refine_network_full_pipeline_parity",
    "test_cli.py::test_train_cli_synthetic_stage1",
    "test_quantize.py::test_quantized_darknet_forward_close",
    "test_s2d.py::test_s2d_darknet_matches_plain",
    "test_stem_pallas.py::test_fused_stem2_packed_matches_two_stages",
    "test_im2col_stem.py::test_im2col_darknet_matches_plain",
    "test_parallel.py::test_train_cli_data_parallel_matches_single",
    "test_int8_act.py::test_s2d_int8_acts_compose",
    "test_trainer_loop.py::test_yolo_and_refine_training_loops",
    "test_stem_pallas.py::test_fused_stem2_s2d_row_padded_and_g2",
    "test_parallel.py::test_dryrun_multichip_dp_only",
    "test_stem_pallas.py::test_serving_preset_pallas_deep_builds_and_runs",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.nodeid.split("tests/")[-1].split("[")[0]
        if base in _SLOW:
            item.add_marker(pytest.mark.slow)
