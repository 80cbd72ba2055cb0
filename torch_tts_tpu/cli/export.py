"""Model export CLI.

Equivalent surface of /root/reference/vits2/export_onnx.py: exports the
inference graph with the (text, text_lengths, scales, sid) signature.
Formats:
  stablehlo  — jax.export serialized module (PJRT-loadable; used by the C++
               driver and `infer/export.load_exported`)
  savedmodel — TF SavedModel via jax2tf (TF-Serving/TFLite tooling)

Usage:
  python -m torch_tts_tpu.cli.export -c config.yaml -m runs/ljspeech \
      --format stablehlo -o vits2.stablehlo
"""

from __future__ import annotations

import argparse
import logging


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-m", "--model-dir", required=True,
                   help="run dir, checkpoint file, or reference G_*.pth")
    p.add_argument("--format", choices=["stablehlo", "savedmodel"],
                   default="stablehlo")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--max-text-len", type=int, default=512)
    p.add_argument("--max-frames", type=int, default=1000)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    from torch_tts_tpu.infer.serving import Synthesizer

    synth = Synthesizer.from_run_dir(args.config, args.model_dir)
    multispeaker = synth.cfg.model.n_speakers > 1

    if args.format == "stablehlo":
        from torch_tts_tpu.infer.export import export_vits2_infer

        export_vits2_infer(
            synth.model, synth.params,
            max_text_len=args.max_text_len, max_frames=args.max_frames,
            multispeaker=multispeaker, path=args.output,
        )
    else:
        from torch_tts_tpu.infer.export import export_vits2_savedmodel

        export_vits2_savedmodel(
            synth.model, synth.params, args.output,
            max_text_len=args.max_text_len, max_frames=args.max_frames,
        )
    print(f"exported {args.format} to {args.output}")


if __name__ == "__main__":
    main()
