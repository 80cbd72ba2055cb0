"""Tacotron AR-decoder inference benchmark (BASELINE config #2).

Full LJSpeech-size model (512 encoder, 1024x2 decoder LSTMs, r=1): encoder +
400 scan steps of [prenet -> attention-LSTM -> monotonic attention ->
decoder-LSTM -> mel projection]. Reports decoded mel frames per second per
chip vs real-time (86.1 frames/s at 22.05 kHz hop 256).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from torch_tts_tpu.core.config import TacotronConfig
    from torch_tts_tpu.models.tacotron import build_tacotron

    cfg = TacotronConfig()  # LJSpeech-size defaults
    model = build_tacotron(cfg)
    B, L, MAX_STEPS = 1, 128, 400
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.integers(1, model.alphabet_size, (B, L)), jnp.int32)
    cond_lengths = jnp.full((B,), L, jnp.int32)

    t0 = time.perf_counter()
    x_dummy = jnp.zeros((B, 2 * cfg.model.r, cfg.audio.num_mels))
    init_rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
                 "dropout": jax.random.PRNGKey(2)}
    shapes = jax.eval_shape(
        lambda: model.init(init_rngs, cond, cond_lengths, x_dummy, train=True,
                           deterministic=False)
    )
    host = np.random.default_rng(0)
    variables = jax.tree.map(
        lambda s: jnp.asarray(0.02 * host.standard_normal(s.shape).astype("float32"))
        if jnp.issubdtype(s.dtype, jnp.floating) else jnp.zeros(s.shape, s.dtype),
        shapes,
    )
    print(f"init: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    @jax.jit
    def infer(variables, cond, cond_lengths, key):
        y, y_post, s, aux = model.apply(
            variables, cond, cond_lengths, max_steps=MAX_STEPS,
            rngs={"dropout": key, "noise": key},
        )
        return y_post, aux["stop_lengths"]

    t0 = time.perf_counter()
    out = infer(variables, cond, cond_lengths, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        out = infer(variables, cond, cond_lengths, jax.random.PRNGKey(i))
        np.asarray(out[0])  # forced readback: block_until_ready does not
                            # await on the tunneled platform
    dt = (time.perf_counter() - t0) / n
    frames = MAX_STEPS * cfg.model.r
    fps = frames / dt
    realtime_fps = cfg.audio.sample_rate / cfg.audio.hop_length
    print(
        f"decode: {dt*1e3:.1f} ms for {frames} frames -> {fps:.0f} frames/s "
        f"({fps/realtime_fps:.1f}x real-time)",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "tacotron2_ar_decode_frames_per_s",
        "value": round(fps, 1),
        "unit": "frames_per_s",
        "vs_baseline": round(fps / realtime_fps / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
