"""Test harness: run every test on an 8-device virtual CPU backend.

Multi-chip sharding (pjit/shard_map over a Mesh) is validated without TPU
hardware via XLA's forced host-platform device count — the JAX-native fake
backend (see SURVEY.md §4). Must be set before jax initializes.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override ambient axon/TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Persistent compilation cache: this box has one CPU core, so XLA compiles
# dominate test wall-time; cache them across runs.
import jax  # noqa: E402

# the environment pre-pins jax_platforms to the axon TPU plugin; force CPU
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


def pytest_configure(config):
    # compile-heavy cases (end-to-end CLI drivers, learning gates,
    # multi-epoch fold training): `-m "not slow"` is the fast pass for
    # iterating on this 1-core box; the full suite stays the merge gate
    config.addinivalue_line(
        "markers",
        "slow: compile-heavy case (deselect with -m 'not slow')")


# Compile-heavy tests, ranked by a full-suite `--durations` run (round 4,
# 424 tests, 41 min with a warm cache): everything below is >= ~15 s/case
# or hides a multi-fold training fixture in module-scoped setup. The
# `-m "not slow"` pass covers all numerics/parity/unit coverage in
# ~8-10 min warm; the full suite stays the merge gate. Prefixes match
# against the nodeid relative to tests/.
_SLOW_PREFIXES = (
    "test_reproduce_reference_sh.py",   # 513 s: full parity-kit run
    "test_learning.py",                 # 29-117 s/case learning gates
    "test_graft_entry.py",              # subprocess entry+dryrun compiles
    "test_cli_end_to_end.py",           # 2-fold training fixture
    "test_cli_other_models.py",         # backbone/hier/APC/CPC CLI trains
    "test_cli_workflows.py",            # predict/relabel/retrain loops
    "test_cli_fold_parallel.py",        # vmapped-fold CLI training
    "test_multifold.py",                # fold-parallel trainings + meshes
    "test_merged_ensemble.py",          # 5-fold merged-layout parity
    "test_resume.py",                   # multi-epoch checkpoint cycles
    "test_parallel.py::TestMeshEquivalence",  # 8-dev full-augmenter jits
    "test_vmap_kernels.py::test_full_augmenter_vmap_matches_loop",
    "test_phase_pool.py::TestModelPhasePool",
    "test_phase_pool.py::TestPhaseConvPool1d::test_block_and_model_parity",
    "test_reference_step_parity.py::TestReferenceStepParity",  # live-torch
    "test_engine.py::TestEngine::test_overfits_synthetic",
    "test_engine.py::TestEngine::test_accumulation_steps",
)


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        nid = item.nodeid.replace("\\", "/")
        if nid.startswith("tests/"):
            nid = nid[len("tests/"):]
        if any(nid.startswith(p) for p in _SLOW_PREFIXES):
            item.add_marker(pytest.mark.slow)
