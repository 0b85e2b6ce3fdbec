"""2-process multi-host test: jax.distributed over localhost (Gloo),
cross-process ("data",) mesh, DP chunk runner parity + put_global /
host_array round trip. The assertions live in tests/_mp_worker.py; this
wrapper spawns the two processes with isolated JAX state.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_parity():
    port = _free_port()
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_PLATFORMS="cpu",
        PYTHONPATH=REPO,
    )
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, (
            f"worker {pid} failed (rc={p.returncode}):\n{out}"
        )
    assert "MP_WORKER_OK 0" in outs[0]
    assert "MP_WORKER_OK 1" in outs[1]
