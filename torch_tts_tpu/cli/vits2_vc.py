"""Voice conversion CLI (multi-speaker VITS2).

Surface for SynthesizerTrn.voice_conversion (models.py:1328-1336 equivalent):
re-synthesize an utterance from a source speaker in a target speaker's voice
via the flow round-trip.

Usage:
  python -m torch_tts_tpu.cli.vits2_vc -c config.yaml -m runs/multispk \
      --wav input.wav --sid-src 3 --sid-tgt 7 -o converted.wav
"""

from __future__ import annotations

import argparse
import logging


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-m", "--model-dir", required=True)
    p.add_argument("--wav", required=True)
    p.add_argument("--sid-src", type=int, required=True)
    p.add_argument("--sid-tgt", type=int, required=True)
    p.add_argument("-o", "--output", default="converted.wav")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from scipy.io import wavfile

    from torch_tts_tpu.core.config import load_vits2_config
    from torch_tts_tpu.data import audio_np
    from torch_tts_tpu.models.vits2 import SynthesizerTrn
    from torch_tts_tpu.train import checkpoint as ckpt
    from torch_tts_tpu.train.vits2_trainer import build_models

    cfg = load_vits2_config(args.config)
    assert cfg.model.n_speakers > 1, "voice conversion needs a multi-speaker model"
    model, _, _ = build_models(cfg)
    a = cfg.audio

    wav, sr = audio_np.load_wav(args.wav)
    assert sr == a.sampling_rate, f"expected {a.sampling_rate} Hz input"
    if cfg.model.use_mel_posterior_encoder:
        feats = audio_np.mel_spectrogram_np(
            wav, a.filter_length, a.n_mel_channels, a.sampling_rate,
            a.hop_length, a.win_length, a.mel_fmin, a.mel_fmax,
        )
    else:
        feats = audio_np.spectrogram_np(wav, a.filter_length, a.hop_length, a.win_length)

    y = jnp.asarray(feats)[None]
    y_lengths = jnp.asarray([feats.shape[0]], jnp.int32)
    sid_src = jnp.asarray([args.sid_src], jnp.int32)
    sid_tgt = jnp.asarray([args.sid_tgt], jnp.int32)

    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(
        rngs, y, y_lengths, sid_src, sid_tgt,
        method=SynthesizerTrn.voice_conversion,
    )
    latest = ckpt.latest_checkpoint(args.model_dir)
    if latest is None:
        raise SystemExit(f"no checkpoint in {args.model_dir}")
    loaded = ckpt.restore_checkpoint(latest, {"params_g": variables["params"]})

    o_hat, y_mask, _ = model.apply(
        {"params": loaded["params_g"]}, y, y_lengths, sid_src, sid_tgt,
        method=SynthesizerTrn.voice_conversion,
        rngs={"noise": jax.random.PRNGKey(0)},
    )
    out = np.clip(np.asarray(o_hat)[0, :, 0], -1, 1)
    wavfile.write(args.output, a.sampling_rate, (out * 32767).astype(np.int16))
    print(f"wrote {args.output}: {len(out) / a.sampling_rate:.2f}s")


if __name__ == "__main__":
    main()
