"""Batch-size sweep for VITS2 inference: find the throughput knee.

Round-3 verdict item 6: BASELINE declared the B=8 path compute-bound without
probing above 8. This sweeps B over {1, 2, 4, 8, 16, 32} with bench.py's
pipelined dependent-chain methodology (one dispatch per call, one final
scalar fetch) and prints a table of ms/call, aggregate real-time factor, and
marginal efficiency, plus one JSON line for the records.

Usage: python scripts/bench_batch_sweep.py [--batches 1,2,4,8,16,32]
       [--chain 10] [--max-frames 1024]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batches", default="1,2,4,8,16,32")
    p.add_argument("--chain", type=int, default=10)
    p.add_argument("--max-frames", type=int, default=1024)
    args = p.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    import jax
    import jax.numpy as jnp

    from torch_tts_tpu.core.config import VITS2Config
    from torch_tts_tpu.models.vits2 import SynthesizerTrn
    from torch_tts_tpu.text import symbols

    cfg = VITS2Config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, pack_narrow_convs=True)
    )
    a = cfg.audio
    model = SynthesizerTrn(
        n_vocab=len(symbols), spec_channels=cfg.posterior_channels,
        segment_frames=cfg.segment_frames, cfg=cfg.model,
    )
    T_X, MAX_FRAMES = 256, args.max_frames
    audio_seconds = MAX_FRAMES * a.hop_length / a.sampling_rate
    print(f"devices: {jax.devices()}", file=sys.stderr)

    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.integers(1, len(symbols), (1, T_X)), jnp.int32)
    init_rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
                 "dropout": jax.random.PRNGKey(2)}
    shapes = jax.eval_shape(
        lambda: model.init(
            init_rngs, x1, jnp.full((1,), T_X, jnp.int32),
            noise_scale=0.667, noise_scale_w=0.8, length_scale=1.0,
            max_frames=MAX_FRAMES, method=SynthesizerTrn.infer,
        )
    )
    host = np.random.default_rng(0)
    variables = jax.tree.map(
        lambda s: jnp.asarray(0.02 * host.standard_normal(s.shape).astype("float32"))
        if jnp.issubdtype(s.dtype, jnp.floating) else jnp.zeros(s.shape, s.dtype),
        shapes,
    )
    jax.block_until_ready(variables)

    @jax.jit
    def infer(variables, x, x_lengths, key, carry):
        key = jax.random.fold_in(key, carry)
        audio, _attn, _ym, _aux, y_lengths = model.apply(
            variables, x, x_lengths,
            noise_scale=0.667, noise_scale_w=0.8, length_scale=1.0,
            max_frames=MAX_FRAMES, method=SynthesizerTrn.infer,
            rngs={"noise": key},
        )
        csum = jnp.sum(jnp.abs(audio))
        return csum, csum.astype(jnp.int32) & 0x3FF

    # FLOPs per call at each batch (XLA cost analysis) for MFU
    peak = 197e12
    base = jax.random.PRNGKey(42)
    rows = []
    prev_rtf = None
    for B in batches:
        xb = jnp.asarray(rng.integers(1, len(symbols), (B, T_X)), jnp.int32)
        lb = jnp.full((B,), T_X, jnp.int32)
        carry = jnp.zeros((), jnp.int32)
        t0 = time.perf_counter()
        csum, carry = infer(variables, xb, lb, base, carry)
        float(np.asarray(csum))  # force server-side compile + execute
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.chain):
            csum, carry = infer(variables, xb, lb, base, carry)
        float(np.asarray(csum))
        dt = (time.perf_counter() - t0) / args.chain
        rtf = B * audio_seconds / dt
        mfu = None
        try:
            # host-side HLO analysis on the UNCOMPILED lowering: a
            # .lower().compile() here would pay the 3-8 min server-side
            # compile a second time per B just to read the flop count
            cost = infer.lower(variables, xb, lb, base, carry).cost_analysis()
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            mfu = float(cost.get("flops", 0.0)) / dt / peak
        except Exception:
            pass
        marginal = (rtf / prev_rtf) if prev_rtf else float("nan")
        prev_rtf = rtf
        rows.append({"B": B, "ms_per_call": round(dt * 1e3, 1),
                     "aggregate_rtf": round(rtf, 1),
                     "mfu": round(mfu, 4) if mfu else None,
                     "compile_s": round(compile_s, 1)})
        print(f"B={B:3d}: {dt*1e3:7.1f} ms/call  {rtf:7.0f}x RT aggregate  "
              f"MFU={100*mfu if mfu else float('nan'):5.1f}%  "
              f"(step-up x{marginal:4.2f}; compile+first {compile_s:.0f}s)",
              file=sys.stderr)

    best = max(rows, key=lambda r: r["aggregate_rtf"])
    print(json.dumps({
        "metric": "vits2_infer_batch_sweep",
        "unit": "x_realtime_aggregate",
        "value": best["aggregate_rtf"],
        "best_batch": best["B"],
        "rows": rows,
    }))


if __name__ == "__main__":
    from tpu_health import await_usable_tpu

    await_usable_tpu()  # half-down-tunnel guard (see scripts/tpu_health.py)
    main()
