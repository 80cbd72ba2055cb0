"""Tacotron streaming TTFA vs the monolithic batch path on the real chip.

The stream (infer/taco_serving.TacotronSynthesizer.stream) decodes the AR
scan in chunks and emits audio through clamped postnet+vocoder windows, so
first audio arrives after ~(threshold/chunk_frames) AR chunks instead of the
bucket's full max_steps scan — and decoding stops at the stop token, which
the monolithic bucket program cannot do.

Reports time-to-first-audio, inter-chunk cadence, total stream time, and the
monolithic latency for the same text. Through the dev tunnel every chunk
pays one ~30 ms round trip (the per-chunk stop-flag fetch); on a
directly-attached TPU that term shrinks to the dispatch cost.

Usage: python scripts/bench_taco_stream.py [--chunk 32] [--pad 48] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TEXT = ("streaming synthesis on tensor processing units delivers the first "
        "audio long before the utterance is finished")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--chunk", type=int, default=32)
    p.add_argument("--pad", type=int, default=48)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from torch_tts_tpu.core.config import load_tacotron_config
    from torch_tts_tpu.infer.taco_serving import TacotronSynthesizer
    from torch_tts_tpu.infer.vocoder import Vocoder
    from torch_tts_tpu.models.tacotron import build_tacotron
    from torch_tts_tpu.ops.hifigan import Generator

    print(f"devices: {jax.devices()}", file=sys.stderr)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_tacotron_config(os.path.join(repo, "configs",
                                            "tacotron-ljspeech.yaml"))

    model = build_tacotron(cfg)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(
        rngs, jnp.zeros((1, 8), jnp.int32), jnp.asarray([8], jnp.int32),
        jnp.zeros((1, 2 * cfg.model.r, cfg.audio.num_mels)),
        train=True, deterministic=False,
    )
    # LJSpeech-shaped HiFi-GAN vocoder (hop 256), random weights — timing is
    # weight-value independent
    gk = dict(
        resblock="1",
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        upsample_rates=(8, 8, 2, 2),
        upsample_initial_channel=512,
        upsample_kernel_sizes=(16, 16, 4, 4),
    )
    voc = Vocoder(
        params=Generator(**gk).init(
            {"params": jax.random.PRNGKey(7)},
            jnp.zeros((1, 8, cfg.audio.num_mels)),
        )["params"],
        gen_kwargs=gk, sample_rate=cfg.audio.sample_rate,
        num_mels=cfg.audio.num_mels,
    )
    synth = TacotronSynthesizer(cfg, variables, vocoder=voc)

    sr, hop, r = cfg.audio.sample_rate, cfg.audio.hop_length, cfg.model.r
    ids = synth.encoder.encode(TEXT)
    bucket = synth._bucket_for(len(ids))
    print(f"text: {len(ids)} ids -> bucket {bucket}", file=sys.stderr)

    # warm both paths (compile + server-side completion)
    t0 = time.perf_counter()
    synth.warmup_streaming(chunk_steps=args.chunk, pad_frames=args.pad)
    print(f"stream warmup: {time.perf_counter()-t0:.0f}s", file=sys.stderr)
    t0 = time.perf_counter()
    ref = synth.synthesize([TEXT], seed=0)[0]
    print(f"monolithic compile+first: {time.perf_counter()-t0:.0f}s "
          f"({ref.audio.size/sr:.2f}s audio)", file=sys.stderr)

    mono, ttfa, cadence, total = [], [], [], []
    for rep in range(args.reps):
        t0 = time.perf_counter()
        res = synth.synthesize([TEXT], seed=rep)[0]
        mono.append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        times = []
        samples = 0
        for chunk in synth.stream(TEXT, seed=rep, chunk_steps=args.chunk,
                                  pad_frames=args.pad):
            times.append(time.perf_counter() - t0)
            samples += chunk.size
        ttfa.append(times[0])
        total.append(times[-1])
        if len(times) > 1:
            cadence.extend(np.diff(times).tolist())
        assert samples == res.audio.size, (samples, res.audio.size)

    audio_s = ref.audio.size / sr
    out = {
        "metric": "tacotron_stream_ttfa",
        "unit": "ms",
        "value": round(float(np.median(ttfa)) * 1e3, 1),
        "monolithic_ms": round(float(np.median(mono)) * 1e3, 1),
        "stream_total_ms": round(float(np.median(total)) * 1e3, 1),
        "chunk_cadence_ms": round(float(np.median(cadence)) * 1e3, 1)
        if cadence else None,
        "audio_s": round(audio_s, 2),
        "chunk_steps": args.chunk,
        "pad_frames": args.pad,
    }
    print(
        f"TTFA {out['value']} ms vs monolithic {out['monolithic_ms']} ms "
        f"({out['monolithic_ms']/max(out['value'],1e-9):.1f}x earlier first "
        f"audio); stream total {out['stream_total_ms']} ms for "
        f"{audio_s:.2f}s audio, cadence {out['chunk_cadence_ms']} ms/chunk",
        file=sys.stderr,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
