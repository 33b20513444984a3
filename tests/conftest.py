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
