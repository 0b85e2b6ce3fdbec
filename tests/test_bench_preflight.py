"""bench.py preflight failure contract: on a wedged TPU grant the
script must still print exactly ONE JSON line (the documented
invocation discards stderr) carrying the error and the last committed
hardware measurement, so a transient wedge at measurement time is
distinguishable from a perf regression (driver BENCH_r{N} records)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("status,code", [("wedged", 3), ("error", 4)])
def test_preflight_failure_prints_one_json_line(status, code):
    prog = f"""
import sys
sys.path.insert(0, {REPO!r})
# JAX_PLATFORMS=cpu in the env is overridden by the axon sitecustomize
# (CLAUDE.md hazard) — force CPU after import so this subprocess can
# never issue a device op on the tunneled TPU, even if a future import
# on bench's chain touches jax.devices().
import jax
jax.config.update("jax_platforms", "cpu")
import benchmarks.tpu_probe as tp
tp.guarded_probe = lambda timeout_s=150.0: (
    {{"status": {status!r}, "error": "boom"}})
import bench
bench.preflight()
raise SystemExit("preflight returned on a failed probe")
"""
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO}
    res = subprocess.run(
        [sys.executable, "-c", prog], capture_output=True, text=True,
        env=env, timeout=300,
    )
    assert res.returncode == code, res.stderr
    out = [ln for ln in res.stdout.splitlines() if ln.strip()]
    assert len(out) == 1, out
    payload = json.loads(out[0])
    assert payload["metric"] == "supervised_train_edges_per_sec"
    assert payload["value"] == 0.0
    assert ("wedged" in payload["error"]) == (status == "wedged")
    # the committed last measurement rides along (benchmarks/BENCH_LAST.json)
    assert payload["last_measured"]["value"] > 0
    assert payload["last_measured"]["unit"] == "edges/s/chip"
