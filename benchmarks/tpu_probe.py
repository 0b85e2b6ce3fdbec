"""One guarded device op: is the TPU grant usable right now?

The axon tunnel holds a device grant for ~15-25 min after any
TPU-attached process dies mid-execution (CLAUDE.md hazard), and every
device op meanwhile hangs indefinitely. Run this BEFORE committing a
long timeout budget to a hardware run:

    python benchmarks/tpu_probe.py            # default 150s watchdog
    python benchmarks/tpu_probe.py --timeout 60

Prints one JSON line {"tpu": "ok"|"wedged"|"error", ...} and exits
0 / 3 / 4. A cold probe includes one remote compile (60-100s — the
persistent cache makes later probes ~1s), so keep the watchdog above
that unless the cache is known-warm.

CAVEAT (benchmarks/KERNEL_NOTES.md, TODO.md): a probe that TIMES OUT
leaves its op in flight on the tunnel and can EXTEND the wedge — after
a "wedged" result, wait the full ~25 min with ZERO device ops (no
jax.devices() on the axon platform either) before retrying.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

# Make the documented ``python benchmarks/tpu_probe.py`` invocation work
# from anywhere: script-mode puts benchmarks/ (not the repo root) on
# sys.path. Do NOT fix this via PYTHONPATH=/root/repo — that drops the
# axon sitecustomize dir and kills TPU registration (CLAUDE.md).
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def guarded_probe(timeout_s: float = 150.0) -> dict:
    """One watchdogged device op; classify the grant state.

    Returns ``{"status": "ok", "platform", "probe_s"}``,
    ``{"status": "wedged", "waited_s"}`` (the op is still in flight —
    the probe itself extends the lease), or
    ``{"status": "error", "error"}`` (the op RAISED — tunnel/compile
    failure, not a wedge; no lease wait needed). Shared by bench.py's
    preflight so wedge-handling fixes land in one place.
    """
    import jax
    import jax.numpy as jnp

    import graphsage_tpu.train  # noqa: F401  (persistent compile cache)

    t0 = time.time()
    done = threading.Event()
    result: dict = {}

    def probe():
        try:
            result["value"] = float(jnp.ones(()) * 2.0)  # fetch = barrier
        except Exception as e:  # noqa: BLE001 — report, don't crash
            result["exc"] = f"{type(e).__name__}: {e}"
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s):
        return {"status": "wedged", "waited_s": round(time.time() - t0, 1)}
    if "exc" in result:
        return {"status": "error", "error": result["exc"]}
    return {
        "status": "ok",
        "platform": jax.devices()[0].platform,
        "probe_s": round(time.time() - t0, 1),
    }


def main() -> int:
    timeout_s = 150.0
    if "--timeout" in sys.argv:
        i = sys.argv.index("--timeout") + 1
        if i >= len(sys.argv):
            print(json.dumps({"tpu": "error",
                              "error": "--timeout requires a value"}),
                  flush=True)
            return 4
        timeout_s = float(sys.argv[i])

    res = guarded_probe(timeout_s)
    if res["status"] == "wedged":
        print(json.dumps({
            "tpu": "wedged",
            "waited_s": res["waited_s"],
            "hint": "grant held by a previously killed process; wait "
                    "~25 min with ZERO device ops before retrying "
                    "(this probe itself extended the lease)",
        }), flush=True)
        os._exit(3)
    if res["status"] == "error":
        print(json.dumps({"tpu": "error", "error": res["error"]}),
              flush=True)
        return 4
    print(json.dumps({"tpu": "ok", "platform": res["platform"],
                      "probe_s": res["probe_s"]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
