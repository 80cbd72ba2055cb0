"""Audio frontend round-trip check.

Equivalent of /root/reference/tacotron/test_audio.py: wav -> mel ->
inverse-mel -> Griffin-Lim -> wav, to audition the frontend configuration.

Usage:
  python -m torch_tts_tpu.cli.audio_check input.wav config.yaml -o roundtrip.wav
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("wav")
    p.add_argument("config")
    p.add_argument("-o", "--output", default="roundtrip.wav")
    p.add_argument("--griffin-lim-iters", type=int, default=32)
    p.add_argument("--direct", action="store_true",
                   help="skip the mel bottleneck (STFT round-trip only)")
    args = p.parse_args()

    import jax.numpy as jnp
    import numpy as np
    from scipy.io import wavfile

    from torch_tts_tpu.audio.frontend import AudioFrontend
    from torch_tts_tpu.core.config import load_tacotron_config
    from torch_tts_tpu.data.audio_np import load_wav

    cfg = load_tacotron_config(args.config)
    fe = AudioFrontend(cfg.audio)
    wav, sr = load_wav(args.wav)
    D_db, M_db = fe.encode(jnp.asarray(wav), sr)
    print(f"encoded: {D_db.shape[0]} frames, {M_db.shape[1]} mels")
    if args.direct:
        out = np.asarray(fe.decode(D_db, n_iter=args.griffin_lim_iters))
    else:
        D_rec = fe.mel_inv(M_db)
        out = np.asarray(fe.decode(D_rec, n_iter=args.griffin_lim_iters))
    out = out / max(1e-6, np.abs(out).max()) * 0.9
    wavfile.write(args.output, cfg.audio.sample_rate,
                  (out * 32767).astype(np.int16))
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
