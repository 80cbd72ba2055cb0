"""MB-iSTFT vs HiFi-GAN decoder quality gate (VERDICT r2 weak-#3 / next-#2).

Matched A/B: identical synthetic corpus, identical seeds, identical training
recipe; each decoder trains --steps (default 2000) through the production
VITS2Trainer step. Every --eval-every steps the held-out eval losses
(teacher-aligned mel / KL / duration from train.vits2_train.make_eval_step)
are recorded; at the end each model free-runs inference on the eval texts and
the synthesized audio's mel-spectral distortion vs the ground-truth recording
is measured over the overlapping prefix.

Decision rule printed at the end (recorded in BASELINE.md):
  PROMOTE-CANDIDATE if final eval mel within 10% of HiFi-GAN's AND synthesis
  MSD within 10%; otherwise KEEP-OPT-IN. (The public MB-iSTFT-VITS paper,
  arXiv:2210.15975, reports near-par MOS at scale — this gate checks the
  trajectory on trainable-in-minutes data, not perceptual quality at 114k
  steps, so "promote" still means "default flip needs a full LJSpeech run".)

Usage: python scripts/quality_ab.py [--steps 2000] [--workdir /tmp/tts_qab]
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

from train_smoke import make_corpus  # same synthetic speech corpus


def spectral_distortion(mel_a: np.ndarray, mel_b: np.ndarray) -> float:
    """Mean L2 distance between log-mel frames over the overlapping prefix
    ([T, n_mels] each; frames are already log-compressed)."""
    T = min(mel_a.shape[0], mel_b.shape[0])
    if T == 0:
        return float("nan")
    d = mel_a[:T] - mel_b[:T]
    return float(np.mean(np.sqrt(np.sum(d * d, axis=-1))))


def train_one(decoder: str, args, cfg0, root):
    import jax
    import jax.numpy as jnp

    from torch_tts_tpu.audio import mel as melmod
    from torch_tts_tpu.data.dataset import TextAudioDataset, collate_batch
    from torch_tts_tpu.models.vits2.model import SynthesizerTrn
    from torch_tts_tpu.train.vits2_train import make_eval_step
    from torch_tts_tpu.train.vits2_trainer import VITS2Trainer

    cfg = cfg0
    if decoder == "mb_istft":
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model, decoder_type="mb_istft",
                upsample_rates=(4, 4), upsample_kernel_sizes=(16, 16),
                subbands=4, gen_istft_n_fft=16, gen_istft_hop_size=4,
            ),
        )

    ds_all = TextAudioDataset.from_ljspeech(root, cfg.audio, cfg.data,
                                            use_mel=True)
    # deterministic holdout: last n_eval utterances
    n_eval = args.n_eval
    ds = TextAudioDataset(ds_all.items[:-n_eval], cfg.audio, cfg.data,
                          use_mel=True)
    eval_ds = TextAudioDataset(ds_all.items[-n_eval:], cfg.audio, cfg.data,
                               use_mel=True)

    run_dir = os.path.join(args.workdir, f"run_{decoder}")
    trainer = VITS2Trainer(
        cfg, run_dir, ds, eval_dataset=None,
        bucket_boundaries=list(args.bucket_boundaries),
        pad_text_to=args.pad_text, eval_max_frames=args.pad_frames,
    )
    eval_step = jax.jit(make_eval_step(cfg, trainer.model))
    eval_batch = collate_batch(
        [eval_ds[i] for i in range(len(eval_ds))],
        pad_text_to=trainer.pad_text, pad_frames_to=args.pad_frames,
    )
    eval_batch = {k: jnp.asarray(v) for k, v in eval_batch.items()}

    curve = []
    step = 0
    epoch = 0
    t0 = time.perf_counter()
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
            if step % args.eval_every == 0 or step == 1:
                em = eval_step(trainer.state.params_g, eval_batch,
                               jax.random.PRNGKey(0))
                em = {k: float(v) for k, v in jax.device_get(em).items()}
                tm = float(jax.device_get(metrics["loss/g/mel"]))
                curve.append({"step": step, "train_mel": tm, **em})
                print(f"[{decoder}] step {step}: train mel {tm:.2f}, "
                      f"eval mel {em['eval/loss_mel']:.2f}, "
                      f"eval kl {em['eval/loss_kl']:.3f} "
                      f"({time.perf_counter()-t0:.0f}s)", file=sys.stderr)

    # free-running synthesis of the eval texts -> mel-spectral distortion vs
    # the ground-truth recordings
    a = cfg.audio
    params = jax.device_get(trainer.state.params_g)

    @jax.jit
    def synth(p, x, xl, key):
        # jitted: eager per-op dispatch of the iSTFT head's complex math is
        # not supported on the TPU backend, and jit is ~100x faster anyway
        return trainer.model.apply(
            {"params": p}, x, xl,
            noise_scale=0.667, noise_scale_w=0.8, length_scale=1.0,
            max_frames=256, method=SynthesizerTrn.infer,
            rngs={"noise": key},
        )

    msds = []
    for i in range(len(eval_ds)):
        item = eval_ds[i]
        x = jnp.asarray(item["x"][None], jnp.int32)
        xl = jnp.asarray([len(item["x"])], jnp.int32)
        w = args.pad_text
        pad = w - x.shape[1] % w if x.shape[1] % w else 0
        x = jnp.pad(x, ((0, 0), (0, pad)))  # bounded compile variants
        audio, _attn, _ym, _aux, y_len = synth(
            params, x, xl, jax.random.PRNGKey(100 + i)
        )
        n = int(np.asarray(y_len)[0]) * a.hop_length
        wav_hat = np.asarray(audio)[0, :n, 0]
        wav_ref = np.asarray(item["wav"]).reshape(-1)
        mel_hat = np.asarray(melmod.mel_spectrogram(
            jnp.asarray(wav_hat[None]), a.filter_length, a.n_mel_channels,
            a.sampling_rate, a.hop_length, a.win_length, a.mel_fmin, a.mel_fmax,
        ))[0]
        mel_ref = np.asarray(melmod.mel_spectrogram(
            jnp.asarray(wav_ref[None]), a.filter_length, a.n_mel_channels,
            a.sampling_rate, a.hop_length, a.win_length, a.mel_fmin, a.mel_fmax,
        ))[0]
        msds.append(spectral_distortion(mel_hat, mel_ref))
    return {"curve": curve, "synthesis_msd": float(np.mean(msds)),
            "synthesis_msd_per_utt": [round(m, 3) for m in msds]}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--eval-every", type=int, default=200)
    p.add_argument("--n-eval", type=int, default=6)
    p.add_argument("--workdir", default="/tmp/tts_qab")
    p.add_argument("--corpus", choices=("smoke", "rich"), default="smoke",
                   help="smoke: train_smoke's sine-tone corpus (round-4 "
                        "artifact); rich: scripts/synth_corpus.py's "
                        "speech-shaped corpus (round-5 long-horizon gate)")
    args = p.parse_args()

    from torch_tts_tpu.core.config import load_vits2_config

    cfg0 = load_vits2_config(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "configs", "vits2-ljspeech.yaml")
    )
    if args.corpus == "rich":
        from synth_corpus import build as build_rich

        root = os.path.join(args.workdir, "data_rich")
        train_fl, _ = build_rich(root, n_train=120, n_eval=0)
        # expose as metadata.csv so from_ljspeech ingests it
        with open(train_fl) as f, \
                open(os.path.join(root, "metadata.csv"), "w") as out_f:
            for line in f:
                path, text = line.rstrip("\n").split("|")
                uid = os.path.splitext(os.path.basename(path))[0]
                out_f.write(f"{uid}|{text}|{text}\n")
        args.bucket_boundaries = (32, 160)
        args.pad_text, args.pad_frames = 112, 160
    else:
        root = make_corpus(os.path.join(args.workdir, "data"), n=30)
        args.bucket_boundaries = (16, 128)
        args.pad_text, args.pad_frames = 48, 128

    out = {}
    for decoder in ("hifigan", "mb_istft"):
        out[decoder] = train_one(decoder, args, cfg0, root)

    h_mel = out["hifigan"]["curve"][-1]["eval/loss_mel"]
    m_mel = out["mb_istft"]["curve"][-1]["eval/loss_mel"]
    h_msd = out["hifigan"]["synthesis_msd"]
    m_msd = out["mb_istft"]["synthesis_msd"]
    promote = (m_mel <= 1.10 * h_mel) and (m_msd <= 1.10 * h_msd)
    out["decision"] = {
        "final_eval_mel": {"hifigan": h_mel, "mb_istft": m_mel},
        "synthesis_msd": {"hifigan": h_msd, "mb_istft": m_msd},
        "gate": "PROMOTE-CANDIDATE" if promote else "KEEP-OPT-IN",
    }
    print(f"final eval mel: hifigan {h_mel:.3f} vs mb_istft {m_mel:.3f}; "
          f"synthesis MSD: {h_msd:.3f} vs {m_msd:.3f} -> "
          f"{out['decision']['gate']}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
