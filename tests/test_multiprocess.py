"""True multi-process jax.distributed test (2 processes x 4 virtual CPU
devices, Gloo collectives over localhost).

The single-process 8-device tests (test_distributed_gn.py,
test_parallel.py) validate sharding semantics but run every collective
inside one runtime; this spawns real separate processes so the psum
actually crosses a process boundary — the closest a single host gets to
the multi-host DCN path (SURVEY.md §2.3 / BASELINE multi-host target).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "mp_gn_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_distributed_gn_across_processes():
    nproc = 2
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), str(nproc), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "MP_GN_OK" in out, f"worker {i} missing OK marker:\n{out}"
