"""End-to-end training smoke on real hardware.

Builds a tiny synthetic "speech" corpus (each symbol maps to a sine tone, so
text <-> audio alignment is learnable), then runs the PRODUCTION training
path — TextAudioDataset -> DistributedBucketSampler -> VITS2Trainer with the
full LJSpeech-size model — for a few hundred steps on the TPU and reports
the mel-loss trajectory. Passes when the loss drops materially.

Usage: python scripts/train_smoke.py [--steps 200] [--workdir /tmp/tts_smoke]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_corpus(root: str, n: int = 24, sr: int = 22050, hop: int = 256):
    from scipy.io import wavfile

    os.makedirs(os.path.join(root, "wavs"), exist_ok=True)
    rng = np.random.default_rng(0)
    letters = "abcdefghij"
    freqs = {c: 200.0 + 60.0 * i for i, c in enumerate(letters)}
    lines = []
    for u in range(n):
        L = int(rng.integers(12, 20))
        text = "".join(rng.choice(list(letters), L))
        seg = hop * 6  # 6 frames per symbol
        wav = np.concatenate([
            0.5 * np.sin(2 * np.pi * freqs[c] * np.arange(seg) / sr) for c in text
        ]).astype(np.float32)
        wav *= np.hanning(len(wav)) * 0.5 + 0.5
        path = os.path.join(root, "wavs", f"u{u}.wav")
        wavfile.write(path, sr, (wav * 32767).astype(np.int16))
        lines.append(f"u{u}|{text}|{' '.join(text)}")
    with open(os.path.join(root, "metadata.csv"), "w") as f:
        f.write("\n".join(lines))
    return root


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--workdir", default="/tmp/tts_smoke")
    p.add_argument("--step-order", default="ddp", choices=["ddp", "lightning"])
    p.add_argument("--decoder", default="hifigan", choices=["hifigan", "mb_istft"],
                   help="mb_istft: the lightweight multi-band iSTFT decoder "
                        "(ops/mb_istft.py) — conv trunk (4,4), iSTFT x4, "
                        "PQMF x4 = hop 256")
    args = p.parse_args()

    import jax

    from torch_tts_tpu.core.config import load_vits2_config
    from torch_tts_tpu.data.dataset import TextAudioDataset
    from torch_tts_tpu.train.vits2_trainer import VITS2Trainer

    import dataclasses

    cfg = load_vits2_config(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "configs", "vits2-ljspeech.yaml")
    )
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, step_order=args.step_order)
    )
    if args.decoder == "mb_istft":
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model, decoder_type="mb_istft",
                upsample_rates=(4, 4), upsample_kernel_sizes=(16, 16),
                subbands=4, gen_istft_n_fft=16, gen_istft_hop_size=4,
            ),
        )
    root = make_corpus(os.path.join(args.workdir, "data"))
    ds = TextAudioDataset.from_ljspeech(root, cfg.audio, cfg.data, use_mel=True)
    print(f"dataset: {len(ds)} utterances, lengths {min(ds.lengths)}-{max(ds.lengths)}")

    run_dir = os.path.join(args.workdir, "run")
    t0 = time.perf_counter()
    trainer = VITS2Trainer(
        cfg, run_dir, ds, eval_dataset=None,
        bucket_boundaries=[16, 128], pad_text_to=48, eval_max_frames=128,
    )
    print(f"trainer init: {time.perf_counter() - t0:.1f}s "
          f"(devices: {jax.devices()})")

    losses = []
    step = 0
    t0 = time.perf_counter()
    epoch = 0
    while step < args.steps:
        epoch += 1
        trainer.sampler.set_epoch(epoch)
        for pad_frames, idxs in trainer.sampler:
            if step >= args.steps:
                break
            batch = trainer._make_batch(pad_frames, idxs)
            trainer.rng, sub = jax.random.split(trainer.rng)
            trainer.state, metrics = trainer.step_fn(trainer.state, batch, sub)
            step += 1
            if step % 20 == 0 or step == 1:
                m = float(jax.device_get(metrics["loss/g/mel"]))
                losses.append((step, m))
                print(f"step {step}: mel loss {m:.2f} "
                      f"({(time.perf_counter() - t0):.0f}s elapsed)")
    first, last = losses[0][1], np.mean([l for _, l in losses[-3:]])
    print(f"mel loss: {first:.2f} -> {last:.2f} "
          f"({'PASS' if last < 0.8 * first else 'FAIL'})")

    # save the trained generator so __graft_entry__.entry() can run the
    # driver's forward probe on real (trained) weights; non-default decoders
    # save under a suffixed name so they can't shadow the entry's
    # (hifigan-shaped) parameter structure
    from flax import serialization

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    suffix = "" if args.decoder == "hifigan" else f"_{args.decoder}"
    out = os.path.join(repo, "artifacts", f"entry_params{suffix}.msgpack")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(trainer.state.params_g)))
    print(f"saved trained generator params -> {out}")


if __name__ == "__main__":
    main()
