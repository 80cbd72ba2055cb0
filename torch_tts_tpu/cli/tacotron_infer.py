"""Tacotron inference CLI.

Equivalent of `python tacotron/inference.py "text" config.yaml [flags]`
(/root/reference/tacotron/inference.py): encode text, run the AR decoder to
max_steps, then synthesize audio either via mel inversion + Griffin-Lim
(synth_audio, :13-22) or — with `--vocoder artifact.msgpack` — hand the mel
to a neural vocoder (synth_audio_vocoder, :25-34: affine renorm + vocoder
forward + peak normalize; ours loads an in-house HiFi-GAN artifact from
infer/vocoder.py instead of a TorchScript blob, trainable via
cli/vocoder_train.py). Also supports a `--ref` style-audio input for
VAE-conditioned models and attention plot dumps.
"""

from __future__ import annotations

import argparse
import logging


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("text")
    p.add_argument("config")
    p.add_argument("--run-dir", default="runs/tacotron")
    p.add_argument("-o", "--output", default="output.wav")
    p.add_argument("--max-steps", type=int, default=400)
    p.add_argument("--ref", default=None, help="reference wav for style (VAE models)")
    p.add_argument("--plot", default=None, help="write attention plot PNG here")
    p.add_argument("--griffin-lim-iters", type=int, default=32)
    p.add_argument("--vocoder", default=None, metavar="ARTIFACT",
                   help="neural-vocoder artifact (infer/vocoder.py msgpack, "
                        "from cli/vocoder_train.py); replaces Griffin-Lim "
                        "(reference inference.py:82-87)")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from scipy.io import wavfile

    from torch_tts_tpu.audio.frontend import AudioFrontend, m_fwd, m_rev
    from torch_tts_tpu.core.config import load_tacotron_config
    from torch_tts_tpu.data.audio_np import load_wav
    from torch_tts_tpu.models.tacotron import build_tacotron
    from torch_tts_tpu.text.encoder import TextEncoder
    from torch_tts_tpu.train import checkpoint as ckpt
    from torch_tts_tpu.train.tacotron_train import TacoTrainState, create_train_state

    cfg = load_tacotron_config(args.config)
    enc = TextEncoder(
        cfg.text.alphabet, cfg.text.character_map,
        cfg.text.bos_symbols or None, cfg.text.eos_symbols or None,
    )
    fe = AudioFrontend(cfg.audio)
    model = build_tacotron(cfg)

    ids = enc.encode(args.text)
    c = jnp.asarray([ids], jnp.int32)
    c_lengths = jnp.asarray([len(ids)], jnp.int32)

    xref = xref_lengths = None
    if args.ref:
        wav, sr = load_wav(args.ref)
        _, M_db = fe.encode(jnp.asarray(wav), sr)
        xref = jnp.asarray(m_fwd(M_db))[None]
        xref_lengths = jnp.asarray([xref.shape[1]], jnp.int32)

    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    dummy_x = jnp.zeros((1, 2 * cfg.model.r, cfg.audio.num_mels))
    variables = model.init(rngs, c, c_lengths, dummy_x, train=True,
                           deterministic=False)
    latest = ckpt.latest_checkpoint(args.run_dir)
    if latest:
        loaded = ckpt.restore_checkpoint(
            latest,
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})},
        )
        variables = {"params": loaded["params"],
                     "batch_stats": loaded["batch_stats"]}
    else:
        logging.warning("no checkpoint in %s; using random init", args.run_dir)

    y, y_post, s, aux = model.apply(
        variables, c, c_lengths, xref=xref, xref_lengths=xref_lengths,
        max_steps=args.max_steps,
        rngs={"dropout": jax.random.PRNGKey(3), "noise": jax.random.PRNGKey(4)},
    )
    n_groups = int(np.asarray(aux["stop_lengths"])[0])
    mel = y_post[0, : n_groups * cfg.model.r]  # [T, M], network domain

    if args.vocoder:
        # synth_audio_vocoder path (inference.py:25-34): affine renorm +
        # neural vocoder + peak normalize
        from torch_tts_tpu.infer.vocoder import check_compat, load_vocoder

        voc = load_vocoder(args.vocoder)
        try:
            check_compat(
                voc, num_mels=cfg.audio.num_mels,
                hop_length=cfg.audio.hop_length,
                sample_rate=cfg.audio.sample_rate,
            )
        except ValueError as e:
            raise SystemExit(str(e))
        wav = voc.synth(mel)[0]
    else:
        # synth_audio path: m_rev -> mel inversion -> Griffin-Lim
        D_db = fe.mel_inv(m_rev(mel))
        wav = np.asarray(fe.decode(D_db, n_iter=args.griffin_lim_iters))
    wav = wav / max(1e-6, np.abs(wav).max()) * 0.9
    wavfile.write(args.output, cfg.audio.sample_rate,
                  (wav * 32767).astype(np.int16))
    print(f"wrote {args.output}: {len(wav) / cfg.audio.sample_rate:.2f}s "
          f"({n_groups} decoder steps)")

    if args.plot:
        from torch_tts_tpu.utils.logging_utils import plot_alignment_to_numpy
        from PIL import Image  # pillow ships with matplotlib

        img = plot_alignment_to_numpy(np.asarray(aux["w"][0, :n_groups]))
        Image.fromarray(img).save(args.plot)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
