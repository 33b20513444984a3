"""REAL 2-process multi-host check (VERDICT r3 #7): the dryrun's
multi-host segment simulates two hosts inside one process; this test
launches an actual ``jax.distributed`` CPU cluster — two OS processes,
4 local devices each — and drives per-host disjoint loading + global
batch assembly (parallel/mesh.py shard_batch via
``make_array_from_process_local_data``) + a jitted loss/grad whose value
must equal the full-batch oracle across the process boundary."""

import os
import socket
import subprocess
import sys


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_cpu():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__),
                          "_multihost_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    # the workers pin their own platform/device count; scrub any inherited
    # forcing flags so local_device_count is exactly 4
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=540)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, (
            f"worker {pid} rc={rc}\nstdout:\n{out[-1500:]}\n"
            f"stderr:\n{err[-1500:]}")
        for marker in (f"MHOK init process={pid}",
                       f"MHOK gradcheck process={pid}",
                       f"MHOK done process={pid}"):
            assert marker in out, (marker, out[-1500:])
