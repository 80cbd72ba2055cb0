"""Int8-quantized decoder A/B: speed (B=1, B=8) + decoder-isolated quality.

Same model/shape protocol as bench.py (LJSpeech-size VITS2, pack_narrow,
1024 frames). The fp32 and int8 models share one parameter tree and one
noise key per call, so the waveform SNR between them isolates exactly the
decoder quantization error. Quality with --ckpt uses trained weights;
without, random weights (reported as such — random weights have
unrealistically flat channel distributions, treat as a lower-confidence
bound).

Usage: python scripts/bench_quant.py [--ckpt run_dir_or_msgpack]
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


def _chain_ms(infer, variables, x, xl, n=20):
    import jax
    import jax.numpy as jnp

    base = jax.random.PRNGKey(42)
    # warmup with per-call syncs: the first executions of a program pay
    # tunnel/allocator warm-up that bench.py amortizes in its per-call loop —
    # without this the first-measured chain reads 4-5x high
    out = infer(variables, x, xl, base, jnp.int32(0))
    for _ in range(3):
        out = infer(variables, x, xl, base, out[-1])
        float(np.asarray(out[-1]))
    t0 = time.perf_counter()
    for i in range(n):
        out = infer(variables, x, xl, base, out[-1])
    float(np.asarray(out[-1]))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None,
                   help="trained run dir (latest ckpt) or .msgpack file")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from torch_tts_tpu.core.config import VITS2Config
    from torch_tts_tpu.models.vits2 import SynthesizerTrn
    from torch_tts_tpu.text import symbols

    cfg = VITS2Config()
    MAX_FRAMES = 1024
    a = cfg.audio
    audio_seconds = MAX_FRAMES * a.hop_length / a.sampling_rate

    def build(quant):
        m = dataclasses.replace(
            cfg.model, pack_narrow_convs=True, quantize_decoder=quant
        )
        return SynthesizerTrn(
            n_vocab=len(symbols), spec_channels=cfg.posterior_channels,
            segment_frames=cfg.segment_frames, cfg=m,
        )

    model_fp, model_q8 = build(False), build(True)

    rng = np.random.default_rng(0)
    T_X = 256
    x1 = jnp.asarray(rng.integers(1, len(symbols), (1, T_X)), jnp.int32)
    xl1 = jnp.full((1,), T_X, jnp.int32)
    x8 = jnp.asarray(rng.integers(1, len(symbols), (8, T_X)), jnp.int32)
    xl8 = jnp.full((8,), T_X, jnp.int32)

    shapes = jax.eval_shape(
        lambda: model_fp.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            x1, xl1, max_frames=MAX_FRAMES, method=SynthesizerTrn.infer,
        )
    )
    host_rng = np.random.default_rng(0)
    variables = jax.tree.map(
        lambda s: jnp.asarray(
            0.02 * host_rng.standard_normal(s.shape).astype("float32"))
        if jnp.issubdtype(s.dtype, jnp.floating)
        else jnp.zeros(s.shape, s.dtype),
        shapes,
    )
    weights = "random"
    if args.ckpt:
        from flax import serialization

        from torch_tts_tpu.train.checkpoint import (
            latest_checkpoint, restore_checkpoint,
        )

        path = args.ckpt
        if os.path.isdir(path):
            path = latest_checkpoint(path)
        state = restore_checkpoint(path, jax.device_get(variables["params"]))
        # run-dir states nest model params under params_g
        if "params_g" in getattr(state, "keys", lambda: [])():
            state = state["params_g"]
        variables = {**variables, "params": state}
        weights = os.path.basename(path)
    # restore_checkpoint returns HOST numpy arrays — device_put once, or every
    # jitted call re-uploads the full parameter set (~150 MB, ~3 s/call
    # through the tunnel; measured the hard way)
    variables = jax.device_put(variables)
    jax.block_until_ready(variables)

    def make_infer(model):
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
            return audio, y_lengths, csum, csum.astype(jnp.int32) & 0x3FF
        return infer

    infer_fp, infer_q8 = make_infer(model_fp), make_infer(model_q8)

    results = {"weights": weights}
    for name, infer, x, xl, b in [
        ("fp32_b1", infer_fp, x1, xl1, 1),
        ("int8_b1", infer_q8, x1, xl1, 1),
        ("fp32_b8", infer_fp, x8, xl8, 8),
        ("int8_b8", infer_q8, x8, xl8, 8),
    ]:
        t0 = time.perf_counter()
        ms = _chain_ms(infer, variables, x, xl)
        rt = b * audio_seconds / (ms / 1e3)
        results[name] = {"ms": round(ms, 2), "rt": round(rt, 1)}
        print(f"{name}: {ms:.2f} ms/call -> {rt:.0f}x RT "
              f"(compile+bench {time.perf_counter()-t0:.0f}s)",
              file=sys.stderr)

    # decoder-isolated quality: same params, same noise key -> identical
    # latents; SNR(fp32 wav, int8 wav) is pure decoder quantization error
    key = jax.random.PRNGKey(7)
    wav_fp = np.asarray(infer_fp(variables, x8, xl8, key, jnp.int32(0))[0])
    wav_q8 = np.asarray(infer_q8(variables, x8, xl8, key, jnp.int32(0))[0])
    err = wav_q8 - wav_fp
    snr = 10 * np.log10(np.sum(wav_fp ** 2) / max(np.sum(err ** 2), 1e-30))
    results["decoder_snr_db"] = round(float(snr), 2)
    # mel distortion between the two decodes (the perceptual proxy)
    from torch_tts_tpu.audio.mel import mel_spectrogram

    def msd(w1, w2):
        m1 = mel_spectrogram(
            jnp.asarray(w1)[..., 0], a.filter_length, a.n_mel_channels,
            a.sampling_rate, a.hop_length, a.win_length, a.mel_fmin, a.mel_fmax,
        )
        m2 = mel_spectrogram(
            jnp.asarray(w2)[..., 0], a.filter_length, a.n_mel_channels,
            a.sampling_rate, a.hop_length, a.win_length, a.mel_fmin, a.mel_fmax,
        )
        return float(jnp.mean(jnp.abs(m1 - m2)))

    results["mel_l1_fp_vs_int8"] = round(msd(wav_fp, wav_q8), 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
