"""Where does batch-1 VITS2 inference time go? Per-stage breakdown + roofline.

VERDICT r2 weak-#1: the 11.6%-MFU-vs-~35-40%-roofline gap on the headline
inference metric was argued, never measured. This script times every stage of
the inference pipeline as its own jitted 20-call dependent chain at the
bench.py shapes (B=1, T_x=256, 1024 latent frames -> 11.9 s of audio), and
pairs each timing with XLA cost analysis (flops + bytes accessed) to compute
a per-stage roofline floor:

  floor = max(flops / 197e12, bytes / 819e9)       (v5e bf16 MXU / HBM BW)

Stages:
  enc_p     text prior encoder (rel-pos transformer x6)
  sdp_rev   stochastic duration predictor, reverse (sampling) path
  expand    generate_path + prior expansion einsums + noise sample
  flow_rev  residual coupling stack, reverse
  dec       full HiFi-GAN decoder
  dec<=i    decoder prefix through upsample stage i (incremental deltas give
            per-stage decoder cost: conv_pre, stage0 (x8), stage1 (x8),
            stage2 (x2), stage3 (x2) + conv_post)
  infer     the whole fused infer program (bench.py's measurement)

The sum of stage times exceeds the fused program (XLA fuses across stage
borders); the *fused* program's aggregate bytes/flops give the honest
roofline for the headline number. Use --no-pack to measure without
pack_narrow_convs.

Timing: 20-call dependent chain, one scalar fetch (CLAUDE.md: the tunnel
pipelines dispatch; block_until_ready does not await execution).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_FLOPS = 197e12  # v5e bf16 MXU peak
PEAK_BW = 819e9  # v5e HBM GB/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-pack", action="store_true",
                    help="disable pack_narrow_convs")
    ap.add_argument("--fuse-mrf", action="store_true",
                    help="fused MRF Pallas kernel on the unpacked C<=128 "
                         "resblock banks (kernels/mrf_fused.py)")
    ap.add_argument("--chain", type=int, default=20)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from torch_tts_tpu.core.config import VITS2Config
    from torch_tts_tpu.models.vits2 import SynthesizerTrn
    from torch_tts_tpu.text import symbols

    cfg = VITS2Config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, pack_narrow_convs=not args.no_pack,
            fuse_mrf=args.fuse_mrf,
        )
    )
    model = SynthesizerTrn(
        n_vocab=len(symbols), spec_channels=cfg.posterior_channels,
        segment_frames=cfg.segment_frames, cfg=cfg.model,
    )

    B, T_X, MAX_F = 1, 256, 1024
    hop = cfg.audio.hop_length
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, len(symbols), (B, T_X)), jnp.int32)
    xl = jnp.full((B,), T_X, jnp.int32)

    init_rngs = {"params": jax.random.PRNGKey(0),
                 "noise": jax.random.PRNGKey(1),
                 "dropout": jax.random.PRNGKey(2)}
    shapes = jax.eval_shape(
        lambda: model.init(
            init_rngs, x, xl, noise_scale=0.667, noise_scale_w=0.8,
            length_scale=1.0, max_frames=MAX_F, method=SynthesizerTrn.infer,
        )
    )
    host = np.random.default_rng(0)
    variables = jax.tree.map(
        lambda s: jnp.asarray(0.02 * host.standard_normal(s.shape).astype("float32"))
        if jnp.issubdtype(s.dtype, jnp.floating)
        else jnp.zeros(s.shape, s.dtype),
        shapes,
    )
    jax.block_until_ready(variables)
    rngs = {"noise": jax.random.PRNGKey(3)}

    results = {}

    def run(name, fn, *fargs):
        """Chained timing + cost analysis of one jitted stage."""

        @jax.jit
        def step(carry, *a):
            out = fn(*a)
            return jnp.sum(jnp.abs(out).astype(jnp.float32)) + carry * 1e-20

        try:
            carry = jnp.zeros(())
            carry = step(carry, *fargs)
            float(np.asarray(carry))
            t0 = time.perf_counter()
            for _ in range(args.chain):
                carry = step(carry, *fargs)
            float(np.asarray(carry))
            dt = (time.perf_counter() - t0) / args.chain
            flops = bytes_ = None
            try:
                cost = step.lower(jnp.zeros(()), *fargs).compile().cost_analysis()
                cost = cost[0] if isinstance(cost, (list, tuple)) else cost
                flops = float(cost.get("flops", 0.0))
                bytes_ = float(cost.get("bytes accessed", 0.0))
            except Exception as e:
                print(f"  (cost analysis failed for {name}: {e})", file=sys.stderr)
            results[name] = {"ms": dt * 1e3, "flops": flops, "bytes": bytes_}
            floor = None
            if flops is not None and bytes_:
                floor = max(flops / PEAK_FLOPS, bytes_ / PEAK_BW)
                results[name]["floor_ms"] = floor * 1e3
                results[name]["pct_of_floor"] = floor / dt * 100
            msg = f"{name:10s} {dt*1e3:8.2f} ms"
            if floor is not None:
                msg += (f"  floor {floor*1e3:7.2f} ms ({floor/dt*100:5.1f}% eff)"
                        f"  {flops/1e9:8.2f} GF {bytes_/1e6:8.1f} MB")
            print(msg, file=sys.stderr)
        except Exception as e:
            print(f"{name:10s} FAILED: {e}", file=sys.stderr)

    def sub(method):
        def apply(*a):
            return model.apply(variables, *a, method=method, rngs=rngs,
                               mutable=False)
        return apply

    # --- non-decoder prefix stages ---
    run("enc_p", sub(lambda m, x, xl: m.enc_p(x, xl, deterministic=True)[0]),
        x, xl)

    hx = jnp.asarray(rng.standard_normal(
        (B, T_X, cfg.model.hidden_channels)).astype(np.float32))
    x_mask = jnp.ones((B, T_X, 1), jnp.float32)
    run("sdp_rev", sub(
        lambda m, hx, xm: m.dp(hx, xm, reverse=True, noise_scale=0.8,
                               deterministic=True)), hx, x_mask)

    # expand: generate_path + einsum expansion + prior noise (infer
    # models.py:1304-1320 equivalents)
    from torch_tts_tpu.core.masks import generate_path, sequence_mask

    m_p = jnp.asarray(rng.standard_normal(
        (B, T_X, cfg.model.inter_channels)).astype(np.float32))
    logs_p = jnp.zeros((B, T_X, cfg.model.inter_channels), jnp.float32)
    logw = jnp.asarray(
        (rng.standard_normal((B, T_X, 1)) * 0.2 + 1.0).astype(np.float32))

    def expand_fn(logw, m_p, logs_p):
        w = jnp.exp(logw) * x_mask
        w_ceil = jnp.ceil(w)
        y_lengths = jnp.maximum(jnp.sum(w_ceil, (1, 2)), 1.0).astype(jnp.int32)
        y_lengths = jnp.minimum(y_lengths, MAX_F)
        y_mask = sequence_mask(y_lengths, MAX_F).astype(jnp.float32)[..., None]
        attn = generate_path(w_ceil[..., 0], MAX_F)
        attn = attn * (y_mask * jnp.swapaxes(x_mask, 1, 2))
        m_e = jnp.einsum("btx,bxd->btd", attn, m_p)
        l_e = jnp.einsum("btx,bxd->btd", attn, logs_p)
        eps = jax.random.normal(jax.random.PRNGKey(0), m_e.shape, m_e.dtype)
        return m_e + eps * jnp.exp(l_e) * 0.667

    run("expand", expand_fn, logw, m_p, logs_p)

    z_p = jnp.asarray(rng.standard_normal(
        (B, MAX_F, cfg.model.inter_channels)).astype(np.float32))
    y_mask = jnp.ones((B, MAX_F, 1), jnp.float32)
    run("flow_rev", sub(
        lambda m, z, ym: m.flow(z, ym, reverse=True, deterministic=True)),
        z_p, y_mask)

    # --- decoder prefixes ---
    z = jnp.asarray(rng.standard_normal(
        (B, MAX_F, cfg.model.inter_channels)).astype(np.float32))
    run("dec_pre", sub(
        lambda m, z: m.dec(z, stop_after_stage=-1)), z)
    n_stages = len(cfg.model.upsample_rates)
    for i in range(n_stages):
        run(f"dec<={i}", sub(
            lambda m, z, i=i: m.dec(z, stop_after_stage=i)), z)
    run("dec", sub(lambda m, z: m.dec(z)), z)

    # --- the fused whole program (bench.py's object of measurement) ---
    def infer_fn(x, xl):
        audio, *_r, yl = model.apply(
            variables, x, xl, noise_scale=0.667, noise_scale_w=0.8,
            length_scale=1.0, max_frames=MAX_F,
            method=SynthesizerTrn.infer, rngs=rngs,
        )
        return audio

    run("infer", infer_fn, x, xl)

    # --- derived: incremental decoder stages ---
    print("--- incremental decoder stages ---", file=sys.stderr)
    prev_key = "dec_pre"
    chain_keys = [f"dec<={i}" for i in range(n_stages)] + ["dec"]
    labels = [f"stage{i}" for i in range(n_stages)] + ["conv_post"]
    for lbl, key in zip(labels, chain_keys):
        if key in results and prev_key in results:
            d_ms = results[key]["ms"] - results[prev_key]["ms"]
            extra = ""
            if results[key].get("bytes") and results[prev_key].get("bytes"):
                d_by = results[key]["bytes"] - results[prev_key]["bytes"]
                d_fl = results[key]["flops"] - results[prev_key]["flops"]
                fl = max(d_fl / PEAK_FLOPS, d_by / PEAK_BW)
                results[f"delta_{lbl}"] = {
                    "ms": d_ms, "flops": d_fl, "bytes": d_by,
                    "floor_ms": fl * 1e3,
                }
                extra = (f"  floor {fl*1e3:7.2f} ms  {d_fl/1e9:8.2f} GF "
                         f"{d_by/1e6:8.1f} MB")
            print(f"{lbl:10s} {d_ms:8.2f} ms{extra}", file=sys.stderr)
        prev_key = key

    print(json.dumps({k: {kk: (round(vv, 3) if isinstance(vv, float) else vv)
                          for kk, vv in v.items()}
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
