"""VITS2 inference CLI.

Equivalent of /root/reference/vits2/inference.py and inference_ms.py (the
script constants become flags): text -> wav with the reference's default
noise scales (0.667 / 0.8 / 1.0, inference.py:56). `--sid` selects the
speaker for multi-speaker checkpoints.

Usage:
  python -m torch_tts_tpu.cli.vits2_infer -c config.yaml -m runs/ljspeech \
      --text "speech synthesis is neat" -o out.wav
"""

from __future__ import annotations

import argparse
import logging


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-m", "--model-dir", required=True,
                   help="run dir (latest checkpoint) or a checkpoint file")
    p.add_argument("--text", default=None)
    p.add_argument("--text-file", default=None,
                   help="file with one text per line; batch-synthesizes via "
                        "the bucketed serving API into out_000.wav, ...")
    p.add_argument("-o", "--output", default="out.wav")
    p.add_argument("--sid", type=int, default=None)
    p.add_argument("--noise-scale", type=float, default=0.667)
    p.add_argument("--noise-scale-w", type=float, default=0.8)
    p.add_argument("--length-scale", type=float, default=1.0)
    p.add_argument("--max-frames", type=int, default=1000)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--average-last", type=int, default=1, metavar="K",
                   help="load the uniform average of the last K generator "
                        "checkpoints (inference smoothing; run dirs only)")
    p.add_argument("--long", action="store_true",
                   help="long-form mode: --text may be arbitrarily long; it "
                        "is split at sentence/clause boundaries, chunks are "
                        "batch-synthesized through the serving API, and the "
                        "audio is concatenated (see --pause-ms)")
    p.add_argument("--pause-ms", type=float, default=0.0,
                   help="silence inserted between long-form chunks")
    p.add_argument("--stream-chunk", type=int, default=0, metavar="FRAMES",
                   help="stream the decoder in FRAMES-sized chunks "
                        "(infer/streaming.py): audio is produced "
                        "incrementally (per-chunk timing printed) and is "
                        "bit-identical to the monolithic decode")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from scipy.io import wavfile

    from torch_tts_tpu.core.config import load_vits2_config
    from torch_tts_tpu.models.vits2 import SynthesizerTrn
    from torch_tts_tpu.text import intersperse, symbols, text_to_sequence
    from torch_tts_tpu.train import checkpoint as ckpt
    from torch_tts_tpu.train.vits2_trainer import build_models

    cfg = load_vits2_config(args.config)
    model, _, _ = build_models(cfg)

    if args.text_file:
        from torch_tts_tpu.infer.serving import Synthesizer

        texts = [l.strip() for l in open(args.text_file) if l.strip()]
        synth = Synthesizer.from_run_dir(args.config, args.model_dir,
                                         average_last=args.average_last)
        sids = [args.sid] * len(texts) if args.sid is not None else None
        results = synth.synthesize(
            texts, noise_scale=args.noise_scale,
            noise_scale_w=args.noise_scale_w, length_scale=args.length_scale,
            sid=sids, seed=args.seed,
        )
        stem = args.output[:-4] if args.output.endswith(".wav") else args.output
        for i, r in enumerate(results):
            path = f"{stem}_{i:03d}.wav"
            wavfile.write(path, r.sample_rate,
                          (np.clip(r.audio, -1, 1) * 32767).astype(np.int16))
            print(f"wrote {path}: {len(r.audio) / r.sample_rate:.2f}s")
        return
    if not args.text:
        p.error("--text or --text-file is required")

    if args.long:
        from torch_tts_tpu.infer.serving import Synthesizer

        synth = Synthesizer.from_run_dir(args.config, args.model_dir,
                                         average_last=args.average_last)
        r = synth.synthesize_long(
            args.text, pause_ms=args.pause_ms, sid=args.sid, seed=args.seed,
            noise_scale=args.noise_scale, noise_scale_w=args.noise_scale_w,
            length_scale=args.length_scale,
        )
        wavfile.write(args.output, r.sample_rate,
                      (np.clip(r.audio, -1, 1) * 32767).astype(np.int16))
        print(f"wrote {args.output}: {len(r.audio) / r.sample_rate:.2f}s")
        return

    ids = text_to_sequence(args.text, list(cfg.data.text_cleaners))
    if cfg.data.add_blank:
        ids = intersperse(ids, 0)
    x = jnp.asarray([ids], jnp.int32)
    x_lengths = jnp.asarray([len(ids)], jnp.int32)
    sid = jnp.asarray([args.sid], jnp.int32) if args.sid is not None else None

    # initialize to get the parameter structure, then load the checkpoint
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(
        rngs, x, x_lengths, sid=sid,
        noise_scale=args.noise_scale, noise_scale_w=args.noise_scale_w,
        length_scale=args.length_scale, max_frames=args.max_frames,
        method=SynthesizerTrn.infer,
    )
    path = args.model_dir
    if not path.endswith(".msgpack"):
        path = ckpt.latest_checkpoint(path)
        if path is None:
            raise SystemExit(f"no checkpoint found in {args.model_dir}")
    if args.average_last > 1 and not args.model_dir.endswith(".msgpack"):
        paths = ckpt.list_checkpoints(args.model_dir)[-args.average_last:]
        loaded = ckpt.average_checkpoints(
            paths, {"params_g": variables["params"]}, subtree="params_g"
        )
    else:
        loaded = ckpt.restore_checkpoint(
            path, {"params_g": variables["params"]}, lenient=True
        )
    params = loaded["params_g"]

    if args.stream_chunk > 0:
        import time

        from torch_tts_tpu.infer.streaming import StreamingDecoder

        t0 = time.perf_counter()
        z, g, y_mask, y_lengths = model.apply(
            {"params": params}, x, x_lengths, sid=sid,
            noise_scale=args.noise_scale, noise_scale_w=args.noise_scale_w,
            length_scale=args.length_scale, max_frames=args.max_frames,
            method=SynthesizerTrn.infer_latents,
            rngs={"noise": jax.random.PRNGKey(args.seed)},
        )
        sd = StreamingDecoder(
            model, {"params": params}, chunk_frames=args.stream_chunk
        )
        pieces = []
        for i, piece in enumerate(sd.stream(z, g, y_mask)):
            piece.block_until_ready()
            pieces.append(np.asarray(piece))
            secs = piece.shape[1] / cfg.audio.sampling_rate
            print(f"chunk {i}: +{secs:.2f}s audio at "
                  f"t={time.perf_counter()-t0:.3f}s")
        audio = np.concatenate(pieces, axis=1)
    else:
        audio, attn, y_mask, _aux, y_lengths = model.apply(
            {"params": params}, x, x_lengths, sid=sid,
            noise_scale=args.noise_scale, noise_scale_w=args.noise_scale_w,
            length_scale=args.length_scale, max_frames=args.max_frames,
            method=SynthesizerTrn.infer,
            rngs={"noise": jax.random.PRNGKey(args.seed)},
        )
    n = int(np.asarray(y_lengths)[0]) * cfg.audio.hop_length
    wav = np.asarray(audio)[0, :n, 0]
    wav16 = (np.clip(wav, -1, 1) * 32767).astype(np.int16)
    wavfile.write(args.output, cfg.audio.sampling_rate, wav16)
    print(f"wrote {args.output}: {n / cfg.audio.sampling_rate:.2f}s")


if __name__ == "__main__":
    main()
