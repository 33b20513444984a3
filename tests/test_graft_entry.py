"""Pin the driver entry contract (__graft_entry__.py).

Round-2 shipped with MULTICHIP_r02.json red because nothing in tests/
imported __graft_entry__: the engine made aug_scale jit-static and the
driver shim kept passing a jnp array. These tests fail on any future
signature drift between the shim and engine internals.

dryrun_multichip mutates XLA_FLAGS / jax_platforms before backend init,
so it must run in a subprocess; entry() is exercised in-process on the
conftest CPU backend.
"""

import os
import subprocess
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_forward_executes():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    import jax

    out = np.asarray(jax.jit(fn)(*args))
    assert out.shape == (args[0].shape[0], 80)
    assert np.all(np.isfinite(out))
    assert np.all((out >= 0.0) & (out <= 1.0))  # sigmoid output


def test_dryrun_multichip_subprocess():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # reuse the persistent test cache so repeat runs are fast
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=REPO_ROOT, env=env, capture_output=True, text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    )
    for marker in ("dp ok", "fold-parallel ok", "fold x dp ok",
                   "multi-host loader ok"):
        assert marker in proc.stdout, (
            f"missing '{marker}' in dryrun output:\n{proc.stdout}"
        )
