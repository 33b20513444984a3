"""Worker for tests/test_multihost_distributed.py: one of two REAL
processes in a jax.distributed CPU cluster (4 local devices each, 8
global). Exercises the true multi-host path across process boundaries —
per-host disjoint loading, ``jax.make_array_from_process_local_data``
global-batch assembly (parallel/mesh.py shard_batch), and a jitted global
reduction + gradient whose value must equal the full-batch answer.

Usage: python tests/_multihost_worker.py <process_id> <coordinator_port>
Prints "MHOK ..." markers the parent asserts on.
"""

import sys


def main() -> None:
    pid = int(sys.argv[1])
    port = sys.argv[2]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2, process_id=pid)

    import jax.numpy as jnp
    import numpy as np

    from freesound_classification_tpu.parallel import mesh as mesh_lib

    assert jax.process_count() == 2
    assert jax.local_device_count() == 4
    assert jax.device_count() == 8
    print(f"MHOK init process={pid}", flush=True)

    mesh = mesh_lib.make_mesh()
    assert mesh.devices.size == 8

    # global batch of 16 rows; this process loads ONLY its 8 (per-host
    # disjoint loading, data/loader.py per_process_rows semantics)
    rng = np.random.RandomState(0)  # same global plan on every host
    global_x = rng.randn(16, 32).astype(np.float32)
    global_y = rng.randn(16).astype(np.float32)
    lo, hi = pid * 8, (pid + 1) * 8
    batch = mesh_lib.shard_batch(
        mesh, {"x": global_x[lo:hi], "y": global_y[lo:hi]})
    assert batch["x"].shape == (16, 32), batch["x"].shape

    w = mesh_lib.replicate_state(mesh, jnp.ones((32,), jnp.float32))

    @jax.jit
    def loss_and_grad(w, x, y):
        def loss_of(w):
            pred = x @ w
            return jnp.mean((pred - y) ** 2)

        return jax.value_and_grad(loss_of)(w)

    loss, grad = loss_and_grad(w, batch["x"], batch["y"])
    loss = float(loss)
    grad = np.asarray(jax.device_get(grad))

    # full-batch oracle on host
    pred = global_x @ np.ones((32,), np.float32)
    want_loss = float(np.mean((pred - global_y) ** 2))
    want_grad = 2.0 * global_x.T @ (pred - global_y) / 16.0
    assert abs(loss - want_loss) < 1e-4 * max(1.0, abs(want_loss)), (
        loss, want_loss)
    np.testing.assert_allclose(grad, want_grad, rtol=1e-4, atol=1e-5)
    print(f"MHOK gradcheck process={pid} loss={loss:.6f}", flush=True)

    jax.distributed.shutdown()
    print(f"MHOK done process={pid}", flush=True)


if __name__ == "__main__":
    main()
