"""Training-step benchmark on the real chip (BASELINE config #5: the full
VITS2 GAN step — MAS + KL + mel + discriminators).

Measures steps/s for the LJSpeech-size model at batch 8 on a 1000-frame
bucket (the reference's largest bucket boundary). Prints human-readable
numbers to stderr and a JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from torch_tts_tpu.core.config import VITS2Config
    from torch_tts_tpu.models.vits2 import MultiPeriodDiscriminator, SynthesizerTrn
    from torch_tts_tpu.text import symbols
    from torch_tts_tpu.train.vits2_train import create_train_state, make_train_step

    cfg = VITS2Config()
    if "--bf16" in sys.argv:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, use_bf16=True)
        )
    if "--no-nanskip" in sys.argv:  # A/B the in-jit NaN-skip select cost
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, skip_nonfinite=False)
        )
    model = SynthesizerTrn(
        n_vocab=len(symbols), spec_channels=cfg.posterior_channels,
        segment_frames=cfg.segment_frames, cfg=cfg.model,
    )
    mpd = MultiPeriodDiscriminator(use_spectral_norm=cfg.model.use_spectral_norm)

    B, T_X, T_Y = 8, 192, 1000
    hop = cfg.audio.hop_length
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.integers(1, len(symbols), (B, T_X)), jnp.int32),
        "x_lengths": jnp.full((B,), T_X, jnp.int32),
        "spec": jnp.asarray(
            rng.standard_normal((B, T_Y, cfg.posterior_channels)).astype(np.float32)
        ),
        "spec_lengths": jnp.full((B,), T_Y, jnp.int32),
        "wav": jnp.asarray(
            (rng.standard_normal((B, T_Y * hop, 1)) * 0.1).astype(np.float32)
        ),
        "wav_lengths": jnp.full((B,), T_Y * hop, jnp.int32),
    }

    t0 = time.perf_counter()
    state, tx = create_train_state(cfg, model, mpd, sample_batch=batch)
    jax.block_until_ready(state.params_g)
    print(f"init: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    step_fn = jax.jit(make_train_step(cfg, model, mpd, tx), donate_argnums=(0,))
    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    jax.block_until_ready(metrics["loss/g/total"])
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    n = 20
    t0 = time.perf_counter()
    for i in range(n):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i + 1))
    # NOTE: block_until_ready does not await on the tunneled platform; a
    # value fetch of the final loss forces the whole 20-step chain (each
    # step consumes the previous state)
    final_loss = float(np.asarray(metrics["loss/g/total"]))
    dt = (time.perf_counter() - t0) / n
    print(
        f"step: {dt*1e3:.1f} ms -> {1/dt:.2f} steps/s "
        f"({B/dt:.1f} utts/s, loss {final_loss:.2f})",
        file=sys.stderr,
    )

    # MFU: XLA-counted FLOPs of the compiled step over measured step time vs
    # the v5e MXU peak (197 TFLOP/s bf16; fp32 matmuls ride bf16 MXU passes).
    mfu = None
    try:
        # reuse the ALREADY-jitted step (a fresh jit without donate_argnums
        # would be a second multi-minute compile)
        cost = (
            step_fn
            .lower(state, batch, jax.random.PRNGKey(0))
            .compile()
            .cost_analysis()
        )
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0))
        peak = 197e12
        mfu = flops / dt / peak
        print(
            f"cost_analysis flops/step: {flops/1e9:.1f} GFLOP -> "
            f"{flops/dt/1e12:.2f} TFLOP/s = {mfu*100:.2f}% of v5e bf16 peak",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "vits2_train_step_batch8_1000frames",
        "value": round(1 / dt, 3),
        "unit": "steps_per_s",
        "vs_baseline": None,
        "mfu": round(mfu, 4) if mfu is not None else None,
    }))


if __name__ == "__main__":
    from tpu_health import await_usable_tpu

    await_usable_tpu()  # half-down-tunnel guard (see scripts/tpu_health.py)
    main()
