"""The driver's multi-chip dryrun must fit its time budget.

Round 4's MULTICHIP artifact failed rc=124 (timeout) even though the sharded
step itself was correct — the tiny-config XLA CPU compile had outgrown the
budget and nothing in-suite caught it. This test runs the ACTUAL driver
entry (`__graft_entry__.py dryrun 8`) in a subprocess and fails loudly if it
regresses past the bound, so a compile-time blowup fails a test instead of
the driver.

Budget rationale: measured 2m51 cold / 56 s warm (persistent compile cache
in .jax_cache/, round 5). The 600 s bound gives a COLD run ~3.5x headroom —
enough that one concurrent XLA-compiling process on the 1-core build host
(CLAUDE.md: concurrency roughly doubles compile wall time) does not flake
the suite — while still catching a return to the 9m45 round-4 state.
"""

import os
import subprocess
import sys
import time



REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUDGET_S = 600.0


def test_dryrun_multichip_fits_driver_budget():
    # bounding happens via subprocess.run(timeout=...): a regression past
    # the budget raises TimeoutExpired and fails the test
    env = dict(os.environ)
    # the entry self-provisions its CPU mesh + compile cache; make sure the
    # suite's own JAX env doesn't leak in
    env.pop("_TTS_DRYRUN_CHILD", None)
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"), "dryrun", "8"],
        capture_output=True, text=True, timeout=BUDGET_S,
        cwd=REPO, env=env,
    )
    dt = time.perf_counter() - t0
    assert proc.returncode == 0, (
        f"dryrun failed rc={proc.returncode}\n{proc.stderr[-2000:]}"
    )
    assert "dryrun_multichip(8): OK" in proc.stdout
    print(f"dryrun_multichip(8) completed in {dt:.0f}s (budget {BUDGET_S:.0f}s)")
