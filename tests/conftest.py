import os

# Tests run on a virtual 8-device CPU mesh; benchmarks run separately on TPU.
# NOTE: jax is already imported by pytest plugins before this conftest runs,
# and the environment pre-sets JAX_PLATFORMS=axon (TPU tunnel), so we must go
# through jax.config rather than os.environ for the platform selection.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite's cost on this 1-core host is jit
# compiles, not data (CLAUDE.md); caching them across runs/processes cuts
# reruns dramatically AND reduces in-process compile volume (long
# single-process full-suite runs have segfaulted inside XLA CPU compilation
# — see the verify skill's known-flake note).
_cache_dir = os.environ.get("EGOEGO_TEST_JAX_CACHE",
                            "/tmp/egoego_jax_test_cache")
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.devices()[0].platform == "cpu"

import pytest  # noqa: E402

# Tests measured >25s on the 1-core host (pytest --durations), marked slow
# centrally so the default run (pytest.ini deselects -m slow) stays under
# ~15 min.  Run EVERYTHING with:  python -m pytest tests/ -q -m ""
SLOW_TESTS = {
    "test_trajar_rollout_and_loss",
    "test_eval_sweep_runs_both_configs",
    "test_release_dims_sharded_step_and_sample",
    "test_release_dims_sharded_canonical_chain_executes",
    "test_installed_package_resolves_from_venv",
    "test_console_entry_point_runs_real_eval",
    "test_native_loader_builds_from_installed_source",
    "test_eval_egoego_cli_end_to_end",
    "test_sharded_chain_matches_unsharded_dp_tp",
    "test_random_init_runs_and_jits",
    "test_train_diffusion_cli_auto_resume",
    "test_batched_eval_under_dp_mesh",
    "test_whole_chain_jit_matches_eager",
    "test_ppo_improves_reward",
    "test_trajar_training_cli_overfits",
    "test_multi_take_mode_end_to_end_smoke",
    "test_physics_controller_tool_smoke",
    "test_collect_failsafe_continues_past_termination",
    "test_pipeline_shard_generates_sharded_and_pads",
    "test_headformer_with_cnn_path",
    "test_sharded_chain_matches_unsharded_dp_only",
    "test_fused_sampler_end_to_end",
    "test_sharded_matches_unsharded",
    "test_mesh_sharded_training_step",
    "test_save_load_exact_resume",
    "test_trpo_update_respects_kl_and_improves",
    "test_fused_denoiser_apply_matches_flax",
    "test_evaluate_sequence_and_batch_consistency",
    "test_run_batches_pipelined_matches_sequential",
    "test_chain_export_roundtrip_matches_live",
    "test_stage1_export_roundtrip_matches_live",
    "test_sharded_chain_export_roundtrip",
    "test_e2e_export_roundtrip_matches_live",
    "test_eval_stage2_cli_batched_sharded",
    "test_eval_egoego_cli_batched_buckets",
    "test_run_egoego_cli_demo_fixture",
    "test_env_reward_ranks_expert_above_perturbed",
    "test_pwcnet_forward_matches_reference",
    "test_eval_trajar_physics_metrics_cli",
    "test_raw_flow_training_step",
    "test_dryrun_multichip_entrypoint_subprocess",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
