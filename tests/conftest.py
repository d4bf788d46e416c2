"""Test configuration: force CPU platform with 8 virtual devices.

The ambient environment pins JAX_PLATFORMS=axon (a remote TPU tunnel) and the
axon plugin ignores the env var, so the platform must be forced through
jax.config.  Multi-device tests exercise real mesh sharding via XLA's
host-platform device-count simulation — the standard JAX trick for testing
pjit/shard_map layouts without hardware (the driver separately dry-runs the
multi-chip path).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


# ---------------------------------------------------------------------------
# Quick tier: `-m "not slow"` (<~5 min) for the dev loop; the full suite is
# the per-round gate.  Tests are marked slow HERE, from measured durations
# (pytest --durations, r5), so the tier stays one list instead of scattered
# decorators.  Module granularity where a whole subsystem's tests are heavy;
# test granularity elsewhere.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

_SLOW_MODULES = {
    # whole-module heavies: multi-minute end-to-end loops
    "test_adaptive_batch",  # 380s controller tracking + 85s learning run
    "test_style_smoke",  # 4 tests x 40-120s (style trainer end-to-end)
    "test_import_reference_ckpt",  # 104s render-from-imported
    "test_parallel",  # 100s sharded-vs-single + 79s mesh learning
}

_SLOW_TESTS = {
    # individual heavies in otherwise-quick modules (>15s measured)
    "test_loss_decreases",  # train_smoke, 124s
    "test_matches_dense",  # marching, 51-61s per param
    "test_window_budget_overflow_is_observable",  # marching, 16s
    "test_matches_budgeted_render",  # render_incremental, 52s
    "test_early_round_tail_overflow_reports_demand",  # 24s
    "test_early_round_sharded_matches_unsharded",  # 24s
    "test_sharded_incremental_matches_unsharded",  # 21s
    "test_early_round_matches_single_round",  # 20s
    "test_sig_overflow_reports_exact_demand",  # 19s
    "test_sharded_matches_unsharded",  # 17s
    "test_dedup_clamped_and_equal",  # hashgrid, 49s
    "test_dedup_bwd_matches_naive_fast",  # 46s
    "test_dedup_bwd_fused_and_autodiff",  # 40s
    "test_grad_matches_fd",  # simplex, 34s
    "test_dedup_bwd_overflow_branch",  # 34s
    "test_dedup_fwd_identical",  # 27s
    "test_fast_bwd_matches_autodiff",  # 21s
    "test_fast_bwd_fused_channels",  # 21s
    "test_packed_bwd_close_to_exact",  # 19s
    "test_fast_matches_slow_path",  # 18s
    "test_loss_and_grads_match_single_phase",  # two_phase_train, 17s
    "test_truncation_is_finite_and_reports_demand",  # 17s
    "test_matches_flatnonzero",  # ops_basic, 17s
    "test_use_dir_changes_arch",  # models, 17s
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        name = item.name.split("[", 1)[0]
        if mod in _SLOW_MODULES or name in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
