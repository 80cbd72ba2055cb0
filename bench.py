"""Headline benchmark: VITS2 single-speaker text->waveform inference RTF per chip.

BASELINE config #3 (/root/repo/BASELINE.json): full LJSpeech-size VITS2
(192/192/768, 6 transformer layers, HiFi-GAN 8-8-2-2) synthesizing
max_frames=1024 frames (11.9 s of 22.05 kHz audio) per jitted call.
Target: >= 10x real-time per TPU v5e chip (BASELINE.md).

Prints exactly one JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from torch_tts_tpu.core.config import VITS2Config
    from torch_tts_tpu.models.vits2 import SynthesizerTrn
    from torch_tts_tpu.text import symbols

    import dataclasses

    cfg = VITS2Config()
    # exact-equivalent space-to-depth packing of the narrow HiFi-GAN tail
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, pack_narrow_convs=True)
    )
    a = cfg.audio
    model = SynthesizerTrn(
        n_vocab=len(symbols),
        spec_channels=cfg.posterior_channels,
        segment_frames=cfg.segment_frames,
        cfg=cfg.model,
    )

    B, T_X, MAX_FRAMES = 1, 256, 1024
    audio_seconds = MAX_FRAMES * a.hop_length / a.sampling_rate

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, len(symbols), (B, T_X)), jnp.int32)
    x_lengths = jnp.full((B,), T_X, jnp.int32)

    print(f"devices: {jax.devices()}", file=sys.stderr)
    init_rngs = {
        "params": jax.random.PRNGKey(0),
        "noise": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    t0 = time.perf_counter()
    # abstract init (no compile) + host-side random fill: benchmark timing is
    # weight-value independent, so skip compiling the real initializers
    shapes = jax.eval_shape(
        lambda: model.init(
            init_rngs, x, x_lengths,
            noise_scale=0.667, noise_scale_w=0.8, length_scale=1.0,
            max_frames=MAX_FRAMES, method=SynthesizerTrn.infer,
        )
    )
    host_rng = np.random.default_rng(0)
    variables = jax.tree.map(
        lambda s: jnp.asarray(
            0.02 * host_rng.standard_normal(s.shape).astype("float32")
        )
        if jnp.issubdtype(s.dtype, jnp.floating)
        else jnp.zeros(s.shape, s.dtype),
        shapes,
    )
    jax.block_until_ready(variables)
    print(f"init: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    @jax.jit
    def infer(variables, x, x_lengths, key):
        audio, attn, y_mask, _aux, y_lengths = model.apply(
            variables, x, x_lengths,
            noise_scale=0.667, noise_scale_w=0.8, length_scale=1.0,
            max_frames=MAX_FRAMES, method=SynthesizerTrn.infer,
            rngs={"noise": key},
        )
        # checksum depends on every audio sample: fetching it forces full
        # execution with only a scalar readback (the dev tunnel's
        # block_until_ready does not await, and its device->host bandwidth
        # is not representative of production serving)
        return audio, y_lengths, jnp.sum(jnp.abs(audio))

    t0 = time.perf_counter()
    out = infer(variables, x, x_lengths, jax.random.PRNGKey(3))
    jax.block_until_ready(out)
    print(f"compile+first call: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # Timing methodology for the tunneled dev TPU: block_until_ready does not
    # await execution, so each timed call synchronously fetches a scalar
    # checksum that depends on every audio sample. This includes one ~30 ms
    # tunnel round trip per call — a conservative bound (on directly-attached
    # hardware the same execution measures ~30 ms less).
    n_iters = 20
    keys = [jax.random.PRNGKey(10 + i) for i in range(n_iters)]
    lats = []
    for k in keys:
        t0 = time.perf_counter()
        _a, _y, csum = infer(variables, x, x_lengths, k)
        float(np.asarray(csum))
        lats.append(time.perf_counter() - t0)
    lat = float(np.median(lats))

    rtf = audio_seconds / lat
    print(
        f"per-call (exec + 1 tunnel RTT): {lat*1e3:.1f} ms for "
        f"{audio_seconds:.2f}s audio",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "vits2_ljspeech_infer_rtf_per_chip",
                "value": round(rtf, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 10.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
