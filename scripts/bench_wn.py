"""Fused WN stack kernel vs XLA layerwise WN, at the production shapes.

Shapes benched (fp32, the training dtype — BASELINE.md records bf16 as a
measured no-op on v5e):
  enc_q : B=8, T=1000, H=192, L=16, k=5   (posterior encoder)
  flow  : B=8, T=1000, H=192, L=4,  k=5   (one coupling's WN; the flow has 4)
  infer : B=1, T=1024, H=192, L=4,  k=5   (flow-reverse at inference)

For each: forward, and full param-grad (value_and_grad) chains, 20 calls,
dependent-value fetch (tunnel pipelines dispatch — see CLAUDE.md). Floors
from XLA cost analysis where available.

Usage: python scripts/bench_wn.py  (real TPU)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_FLOPS = 197e12
PEAK_BW = 819e9


def _chain(fn, *args, n=20):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(carry, *a):
        return jnp.sum(fn(*a).astype(jnp.float32)) + carry * 0

    carry = jnp.zeros(())
    carry = step(carry, *args)
    float(np.asarray(carry))
    t0 = time.perf_counter()
    for _ in range(n):
        carry = step(carry, *args)
    float(np.asarray(carry))
    dt = (time.perf_counter() - t0) / n
    flops = bytes_ = None
    try:
        cost = step.lower(jnp.zeros(()), *args).compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0))
        bytes_ = float(cost.get("bytes accessed", 0.0))
    except Exception:
        pass
    return dt, flops, bytes_


def main():
    import jax
    import jax.numpy as jnp

    from torch_tts_tpu.ops.wavenet import WN

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    results = {}
    rng = np.random.default_rng(0)

    for name, (B, T, H, L) in {
        "enc_q": (8, 1000, 192, 16),
        "flow1": (8, 1000, 192, 4),
        "infer_flow1": (1, 1024, 192, 4),
    }.items():
        x = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))
        mask = jnp.ones((B, T, 1), jnp.float32)
        wn_x = WN(H, 5, 1, L, fused=False)
        variables = wn_x.init(jax.random.PRNGKey(0), x, mask)
        wn_f = WN(H, 5, 1, L, fused=True)

        for tag, mod in (("xla", wn_x), ("fused", wn_f)):
            dt, fl, by = _chain(
                lambda p, xx: mod.apply({"params": p}, xx, mask),
                variables["params"], x,
            )
            row = {"ms": round(dt * 1e3, 3)}
            if fl:
                row["floor_ms"] = round(
                    max(fl / PEAK_FLOPS, (by or 0) / PEAK_BW) * 1e3, 3)
                row["GF"] = round(fl / 1e9, 1)
                row["MB"] = round((by or 0) / 1e6, 1)
            results[f"{name}/{tag}/fwd"] = row
            print(f"{name:12s} {tag:5s} fwd  {row}", file=sys.stderr)

            def loss(p, xx):
                out = mod.apply({"params": p}, xx, mask)
                return jnp.sum(out * out)

            def gradsum(p, xx):
                gr = jax.grad(loss)(p, xx)
                return jax.tree_util.tree_reduce(
                    lambda a, l: a + jnp.sum(jnp.abs(l)), gr, jnp.zeros(())
                )

            dt, fl, by = _chain(gradsum, variables["params"], x)
            row = {"ms": round(dt * 1e3, 3)}
            if fl:
                row["floor_ms"] = round(
                    max(fl / PEAK_FLOPS, (by or 0) / PEAK_BW) * 1e3, 3)
                row["GF"] = round(fl / 1e9, 1)
                row["MB"] = round((by or 0) / 1e6, 1)
            results[f"{name}/{tag}/grad"] = row
            print(f"{name:12s} {tag:5s} grad {row}", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
