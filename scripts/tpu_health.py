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
    """Run one probe stage in a fresh subprocess under a hard timeout.

    The stage runs in its own session (process group) and the WHOLE group is
    SIGKILLed in a finally block: a stage wedged inside a PJRT fetch ignores
    SIGTERM, so if this probe is itself terminated from outside (e.g. an
    outer `timeout` without -k) the wedged grandchild must not survive as an
    orphan holding the tunnel."""
    import os
    import signal

    t0 = time.perf_counter()
    proc = subprocess.Popen(
        [sys.executable, "-c", _STAGE_SRC[name]],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        start_new_session=True,
    )
    try:
        out, err = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return {"status": "timeout", "seconds": round(time.perf_counter() - t0, 1)}
    finally:
        try:  # reap the stage's whole group, wedged fetch threads included
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
    wall = round(time.perf_counter() - t0, 1)
    proc_stdout, proc_stderr = out, err
    for line in proc_stdout.splitlines():
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
    tail = (proc_stderr or proc_stdout).strip().splitlines()[-3:]
    return {"status": "error", "seconds": wall, "rc": proc.returncode,
            "detail": " | ".join(tail)}


def await_usable_tpu(max_wait_s: float = 900.0,
                     probe_timeout_s: float = 150.0) -> None:
    """Shared bench pre-flight: poll the tunnel with the staged subprocess
    probes until a dispatch+fetch round trip succeeds, or raise SystemExit(3).

    Used by bench.py and every scripts/bench_*.py that touches the real TPU:
    the tunnel's half-down mode (dispatch OK, fetches wedge minutes+ and
    ignore SIGTERM) would otherwise hang each of them unkillably at the first
    fetch. The default probe timeout is generous (150 s) because stage 2 pays
    an untimed fresh-compile + first fetch that can stall 8-80 s even on a
    healthy tunnel (CLAUDE.md); the per-attempt budget is additionally capped
    to the remaining deadline so total wall time cannot overshoot."""
    deadline = time.perf_counter() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        remaining = deadline - time.perf_counter()
        if remaining <= 0:
            print("tpu pre-flight: tunnel unusable (device fetches wedge); "
                  "refusing to start an unkillable benchmark", file=sys.stderr)
            raise SystemExit(3)
        budget = min(probe_timeout_s, max(10.0, remaining))
        stages: dict = {}
        ok = True
        for name in _ORDER[:2]:
            res = run_stage(name, budget)
            stages[name] = res
            if res["status"] != "ok":
                ok = False
                break
        if ok:
            if attempt > 1:
                print(f"tpu pre-flight: recovered on attempt {attempt}",
                      file=sys.stderr)
            return
        print(f"tpu pre-flight attempt {attempt} failed: "
              f"{json.dumps(stages)}", file=sys.stderr)
        time.sleep(min(60.0, max(0.0, deadline - time.perf_counter())))


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
