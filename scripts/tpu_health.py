"""TPU tunnel health probe: is the chip usable RIGHT NOW, and how degraded?

The tunneled dev TPU in this image has distinct failure modes that look
identical ("my bench hangs") from inside a benchmark:
  - device enumeration hangs forever (tunnel down; CLAUDE.md "DOWN for
    hours" mode),
  - dispatch works but the first result fetch per executable stalls
    8-80 s (server-side compile/load; documented in CLAUDE.md) — or, in
    the pathological mode, minutes+,
  - everything works but round-trip latency is inflated (slow day:
    expect +-15% variance on any single number).

Each stage runs in a FRESH subprocess under a hard timeout, so a wedged
tunnel cannot wedge the probe. Stages escalate:
  1. enumerate : import jax + jax.devices()
  2. dispatch  : tiny jitted add, scalar fetch (RTT floor, ~30 ms healthy)
  3. compile   : fresh executable (shape not seen before in that process)
     + first fetch — the stall-prone path benchmarks pay per program

Prints one JSON line: {"ok": bool, "stages": {...}} with per-stage status
(ok/timeout/error) and seconds. Exit code 0 iff all requested stages pass.

Usage: python scripts/tpu_health.py [--timeout S] [--stages 1|2|3]
(stage N implies 1..N; default 3, timeout 120 s per stage).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

_STAGE_SRC = {
    "enumerate": """
import jax
ds = jax.devices()
print("PROBE_OK", len(ds), ds[0].platform, flush=True)
""",
    "dispatch": """
import time
import jax, jax.numpy as jnp
x = jax.device_put(jnp.arange(8.0))
f = jax.jit(lambda v: jnp.sum(v * 2.0))
float(f(x))  # compile + first fetch (not timed: stage 3's job)
t0 = time.perf_counter()
for _ in range(5):
    float(f(x))
print("PROBE_OK", (time.perf_counter() - t0) / 5, flush=True)
""",
    # an odd, probe-specific shape so the server cannot have it cached from
    # stage 2; the timed region is exactly what benchmarks pay per program
    "compile": """
import time
import jax, jax.numpy as jnp
x = jax.device_put(jnp.ones((3, 131)))
f = jax.jit(lambda v: jnp.tanh(v @ v.T).sum())
t0 = time.perf_counter()
float(f(x))  # trace + compile + execute + FIRST fetch
print("PROBE_OK", time.perf_counter() - t0, flush=True)
""",
}

_ORDER = ("enumerate", "dispatch", "compile")


def run_stage(name: str, timeout_s: float) -> dict:
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _STAGE_SRC[name]],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return {"status": "timeout", "seconds": round(time.perf_counter() - t0, 1)}
    wall = round(time.perf_counter() - t0, 1)
    for line in proc.stdout.splitlines():
        if line.startswith("PROBE_OK"):
            parts = line.split()[1:]
            out = {"status": "ok", "seconds": wall}
            if name == "enumerate":
                out["devices"], out["platform"] = int(parts[0]), parts[1]
            elif name == "dispatch":
                out["rtt_ms"] = round(float(parts[0]) * 1e3, 1)
            elif name == "compile":
                out["compile_first_fetch_s"] = round(float(parts[0]), 1)
            return out
    tail = (proc.stderr or proc.stdout).strip().splitlines()[-3:]
    return {"status": "error", "seconds": wall, "rc": proc.returncode,
            "detail": " | ".join(tail)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=120.0,
                    help="hard per-stage timeout, seconds")
    ap.add_argument("--stages", type=int, default=3, choices=(1, 2, 3),
                    help="run stages 1..N")
    args = ap.parse_args()

    stages: dict = {}
    ok = True
    for name in _ORDER[: args.stages]:
        res = run_stage(name, args.timeout)
        stages[name] = res
        if res["status"] != "ok":
            ok = False
            break  # later stages would hang on the same fault
    print(json.dumps({"ok": ok, "stages": stages}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
