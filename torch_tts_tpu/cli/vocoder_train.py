"""Neural vocoder (mel->waveform HiFi-GAN) training CLI.

The reference ships no vocoder trainer — tacotron inference loads an
externally-trained TorchScript vocoder (/root/reference/tacotron/
inference.py:84-86). This trains the in-house equivalent natively: the
ops/hifigan.py Generator inverting the tacotron audio frontend's mel
(m_fwd network domain, renormed with the reference handoff's affine), with
the HiFi-GAN recipe (MPD adversarial + feature matching + L1 mel) or
`--no-gan` recon-only bootstrap. Writes a self-describing artifact that
`cli/tacotron_infer.py --vocoder` consumes (infer/vocoder.py).

Usage:
  python -m torch_tts_tpu.cli.vocoder_train FILELIST config.yaml \
      [--run-dir runs/vocoder] [--steps N] [--seg-frames 32] [--no-gan]

FILELIST: one wav path per line (absolute or relative to --data-root), or a
directory to glob for *.wav.
"""

from __future__ import annotations

import argparse
import logging
import os


def _wav_list(path: str, data_root: str):
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".wav")
        )
    out = []
    with open(path) as f:
        for line in f:
            p = line.strip().split("|")[0]
            if p:
                out.append(p if os.path.isabs(p) else os.path.join(data_root, p))
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("filelist", help="wav filelist (or directory of wavs)")
    p.add_argument("config", help="tacotron config YAML (audio section)")
    p.add_argument("--data-root", default=".")
    p.add_argument("--run-dir", default="runs/vocoder")
    p.add_argument("--steps", type=int, default=100000)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--seg-frames", type=int, default=32,
                   help="mel frames per training segment")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--lr-decay", type=float, default=0.999)
    p.add_argument("--c-mel", type=float, default=45.0)
    p.add_argument("--no-gan", action="store_true",
                   help="recon-only (L1 mel + L1 wav) — fast bootstrap")
    p.add_argument("--upsample-initial-channel", type=int, default=256)
    p.add_argument("--log-interval", type=int, default=100)
    p.add_argument("--ckpt-interval", type=int, default=5000)
    p.add_argument("--seed", type=int, default=1234)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("vocoder_train")

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from torch_tts_tpu.audio.frontend import AudioFrontend, m_fwd
    from torch_tts_tpu.core.config import load_tacotron_config
    from torch_tts_tpu.data.audio_np import load_wav
    from torch_tts_tpu.infer.vocoder import (
        REF_MEL_SCALE,
        REF_MEL_SHIFT,
        save_vocoder,
    )
    from torch_tts_tpu.models.vits2 import MultiPeriodDiscriminator
    from torch_tts_tpu.ops.hifigan import Generator
    from torch_tts_tpu.train import checkpoint as ckpt
    from torch_tts_tpu.train.vocoder_train import (
        create_vocoder_state,
        make_mel_fn,
        make_vocoder_train_step,
    )

    cfg = load_tacotron_config(args.config)
    a = cfg.audio
    fe = AudioFrontend(a)
    hop = a.hop_length

    # factor hop into HiFi-GAN upsample rates (largest-first, each stage
    # kernel = 2*rate — the standard HiFi-GAN pairing)
    rates = []
    h = hop
    for r in (8, 8, 5, 4, 3, 2):
        while h % r == 0 and h > 1:
            rates.append(r)
            h //= r
    if h != 1:
        rates.append(h)
    rates.sort(reverse=True)
    gen_kwargs = dict(
        resblock="1",
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5),) * 3,
        upsample_rates=tuple(rates),
        upsample_initial_channel=args.upsample_initial_channel,
        upsample_kernel_sizes=tuple(2 * r for r in rates),
    )
    gen = Generator(**gen_kwargs)
    mpd = None if args.no_gan else MultiPeriodDiscriminator()
    log.info("hop=%d -> upsample_rates=%s, gan=%s", hop, rates, not args.no_gan)

    # ---- corpus: encode every wav once, cache mel_net + normalized wave ----
    utts = []
    for path in _wav_list(args.filelist, args.data_root):
        wav, sr = load_wav(path)
        wav = jnp.asarray(wav)
        if sr != a.sample_rate:
            from torch_tts_tpu.audio.frontend import resample_poly

            wav = jnp.asarray(resample_poly(np.asarray(wav), sr, a.sample_rate))
        wav = wav / jnp.maximum(jnp.max(jnp.abs(wav)), 1e-8)
        _, M_db = fe.encode(wav)
        mel = np.asarray(m_fwd(M_db))  # [T, M]
        if mel.shape[0] >= args.seg_frames + 2:
            utts.append((np.asarray(wav), mel))
    if not utts:
        raise SystemExit("no usable utterances (all shorter than --seg-frames)")
    log.info("%d utterances cached", len(utts))

    mel_fn = make_mel_fn(fe)
    sched = optax.exponential_decay(args.lr, 1000, args.lr_decay)
    mk_tx = lambda: optax.adamw(sched, b1=0.8, b2=0.99, weight_decay=0.01)  # noqa: E731
    tx_g, tx_d = mk_tx(), (None if args.no_gan else mk_tx())
    state = create_vocoder_state(
        gen, tx_g, a.num_mels, mpd=mpd, tx_d=tx_d, seed=args.seed,
        seg_frames=args.seg_frames, hop=hop,
    )
    latest = ckpt.latest_checkpoint(args.run_dir)
    if latest:
        state = ckpt.restore_checkpoint(latest, state)
        log.info("resumed from %s (step %d)", latest, int(state.step))

    step_fn = jax.jit(
        make_vocoder_train_step(
            gen, mel_fn, tx_g, mpd=mpd, tx_d=tx_d,
            mel_shift=REF_MEL_SHIFT, mel_scale=REF_MEL_SCALE,
            c_mel=args.c_mel, c_wav=(1.0 if args.no_gan else 0.0),
        )
    )

    rng = np.random.default_rng(args.seed)
    seg_f, seg_s = args.seg_frames, args.seg_frames * hop

    def sample_batch():
        mels = np.empty((args.batch_size, seg_f, a.num_mels), np.float32)
        wavs = np.empty((args.batch_size, seg_s), np.float32)
        for i in range(args.batch_size):
            wav, mel = utts[rng.integers(len(utts))]
            # conditioning AND mel-loss target = the full-utterance mel
            # sliced at [t0, t0+seg_f) — the generated wav's loss mel is
            # re-framed from the segment (center=True), so its first/last
            # ~n_fft/2/hop frames see different padding; same edge-frame
            # approximation as the original HiFi-GAN recipe
            t0 = int(rng.integers(0, mel.shape[0] - seg_f))
            mels[i] = mel[t0 : t0 + seg_f]
            s0 = t0 * hop
            seg = wav[s0 : s0 + seg_s]
            if len(seg) < seg_s:
                seg = np.pad(seg, (0, seg_s - len(seg)))
            wavs[i] = seg
        return {"wav": jnp.asarray(wavs), "mel": jnp.asarray(mels)}

    start = int(state.step)
    for k in range(start, args.steps):
        state, metrics = step_fn(state, sample_batch())
        if (k + 1) % args.log_interval == 0:
            log.info(
                "step %d: %s", k + 1,
                {m: f"{float(v):.4f}" for m, v in metrics.items()},
            )
        if (k + 1) % args.ckpt_interval == 0 or k + 1 == args.steps:
            ckpt.save_checkpoint(args.run_dir, k + 1, state)
            save_vocoder(
                os.path.join(args.run_dir, "vocoder.msgpack"),
                state.params_g, gen_kwargs=gen_kwargs,
                sample_rate=a.sample_rate, num_mels=a.num_mels,
            )
    log.info("done; artifact at %s/vocoder.msgpack", args.run_dir)


if __name__ == "__main__":
    main()
