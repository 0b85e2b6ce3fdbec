"""2-process multi-host tests: jax.distributed over localhost (Gloo).

* test_two_process_dp_parity — cross-process ("data",) mesh, P1 DP chunk
  runner parity + put_global / host_array round trip (_mp_worker.py).
* test_two_process_graph_sharded_parity — cross-process ("graph",) mesh,
  P2 sharded chunk runner parity + per-host feature shard loading off a
  deferred mmap table (_mp_worker_sharded.py).

The assertions live in the worker scripts; these wrappers spawn the two
processes with isolated JAX state.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(worker: str, ok_tag: str, extra_args=()):
    port = _free_port()
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_PLATFORMS="cpu",
        PYTHONPATH=REPO,
    )
    script = os.path.join(REPO, "tests", worker)
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(port), str(pid), *extra_args],
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
    assert f"{ok_tag} 0" in outs[0]
    assert f"{ok_tag} 1" in outs[1]


def test_two_process_dp_parity():
    _run_workers("_mp_worker.py", "MP_WORKER_OK")


def test_two_process_graph_sharded_parity(tmp_path):
    from graphsage_tpu.data.synthetic import make_synthetic_graph, write_dataset

    g = make_synthetic_graph(num_nodes=120, num_classes=3, feat_dim=8, seed=7)
    prefix = str(tmp_path / "mp" / "synth")
    write_dataset(g, prefix)
    _run_workers("_mp_worker_sharded.py", "MP_COMPOSED_OK", (prefix,))
