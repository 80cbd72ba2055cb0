"""Tacotron AR step at the full LJSpeech size (1024x2 LSTMs): XLA scan vs
the HBM-streamed fused kernel (kernels/taco_step.py taco_step_streamed).

The 1024-dim config carries ~74 MB of LSTM weights per step — far beyond
VMEM — so the fused-VMEM kernel (taco_step_fused) cannot apply. The
streamed variant double-buffers [K, n_tile] column tiles from HBM; its
floor is the weight-bandwidth: 74 MB / 819 GB/s = 90 us/step fp32,
45 us/step with bf16 weights.

Method: N steps chained through one jitted lax.scan per variant (the real
AR decode structure), one dependent fetch at the end; per-step = total/N.

Usage: python scripts/bench_taco_step.py [--steps 256] [--n-tile 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=256)
    p.add_argument("--n-tile", type=int, default=512)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from torch_tts_tpu.kernels.taco_step import (
        TacoStepState,
        TacoStepWeights,
        taco_step_ref,
        taco_step_streamed,
    )

    # LJSpeech production dims (core/config.py TacotronModelConfig defaults)
    B, L, Dmel, P, Dc, H1, H2, r = 1, 128, 80, 256, 512, 1024, 1024, 1
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)
    wts = TacoStepWeights(
        prenet_w1=f(Dmel, P), prenet_b1=f(P), prenet_w2=f(P, P), prenet_b2=f(P),
        att_w_ih=f(P + Dc, 4 * H1), att_w_hh=f(H1, 4 * H1), att_b=f(4 * H1),
        query_w=f(H1, Dc),
        dec_w_ih=f(H1 + Dc, 4 * H2), dec_w_hh=f(H2, 4 * H2), dec_b=f(4 * H2),
        mel_w=f(H2 + Dc, r * Dmel), mel_b=f(r * Dmel),
        stop_w=f(H2 + Dc, r), stop_b=f(r),
    )
    big = ("att_w_ih", "att_w_hh", "dec_w_ih", "dec_w_hh")
    big_bytes = sum(int(np.prod(getattr(wts, n).shape)) * 4 for n in big)
    print(f"streamed weights: {big_bytes/1e6:.1f} MB fp32", file=sys.stderr)

    w0 = jnp.zeros((B, L)).at[:, 0].set(1.0)
    state0 = TacoStepState(w=w0, ctx=jnp.zeros((B, Dc)),
                           h_att=jnp.zeros((B, H1)), c_att=jnp.zeros((B, H1)),
                           h_dec=jnp.zeros((B, H2)), c_dec=jnp.zeros((B, H2)))
    memory = f(B, L, Dc)
    mmask = jnp.ones((B, L))
    y0 = jnp.zeros((B, Dmel))

    def make_scan(step_fn, w):
        def scan_fn(carry, _):
            y, st = carry
            y_new, s, st_new = step_fn(y, st, memory, mmask, w)
            return (y_new[:, :Dmel], st_new), s

        @jax.jit
        def run(y, st):
            (yf, stf), ss = jax.lax.scan(scan_fn, (y, st), None,
                                         length=args.steps)
            return yf, ss

        return run

    def bench(name, step_fn, w):
        run = make_scan(step_fn, w)
        yf, ss = run(y0, state0)  # compile
        np.asarray(yf)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            yf, ss = run(y0, state0)
            np.asarray(yf)  # dependent fetch forces the chain
            best = min(best, time.perf_counter() - t0)
        us = best / args.steps * 1e6
        print(f"{name}: {us:.1f} us/step ({args.steps} steps, best of "
              f"{args.reps})", file=sys.stderr)
        return us, np.asarray(yf)

    us_ref, y_ref = bench("xla-scan (jnp reference)", taco_step_ref, wts)

    def streamed_fp32(y, st, mem, msk, w):
        return taco_step_streamed(y, st, mem, msk, w, n_tile=args.n_tile)

    us_str, y_str = bench("streamed fp32", streamed_fp32, wts)
    err32 = float(np.max(np.abs(y_ref - y_str)))
    print(f"  fp32 kernel vs reference: max |dy|={err32:.2e}", file=sys.stderr)

    wts16 = TacoStepWeights(*[
        w.astype(jnp.bfloat16) if n in big else w
        for n, w in zip(TacoStepWeights._fields, wts)
    ])
    us_b16, y_b16 = bench("streamed bf16 weights", streamed_fp32, wts16)
    err16 = float(np.max(np.abs(y_ref - y_b16)))
    print(f"  bf16 kernel vs reference: max |dy|={err16:.2e}", file=sys.stderr)

    def streamed_vpu(y, st, mem, msk, w):
        return taco_step_streamed(y, st, mem, msk, w, n_tile=args.n_tile,
                                  gemv="vpu")

    us_v32, _ = bench("streamed fp32 vpu-gemv", streamed_vpu, wts)
    us_v16, y_v16 = bench("streamed bf16 vpu-gemv", streamed_vpu, wts16)
    errv = float(np.max(np.abs(y_ref - y_v16)))
    print(f"  vpu bf16 vs reference: max |dy|={errv:.2e}", file=sys.stderr)

    floor32 = big_bytes / 819e9 * 1e6
    print(json.dumps({
        "xla_us_per_step": round(us_ref, 1),
        "streamed_fp32_us_per_step": round(us_str, 1),
        "streamed_bf16_us_per_step": round(us_b16, 1),
        "vpu_fp32_us_per_step": round(us_v32, 1),
        "vpu_bf16_us_per_step": round(us_v16, 1),
        "bw_floor_fp32_us": round(floor32, 1),
        "bw_floor_bf16_us": round(floor32 / 2, 1),
        "speedup_fp32": round(us_ref / us_str, 2),
        "speedup_bf16": round(us_ref / us_b16, 2),
        "fp32_max_err": err32,
        "bf16_max_err": err16,
    }))


if __name__ == "__main__":
    main()
