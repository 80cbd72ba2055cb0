"""VITS2 training CLI.

Equivalent of `python vits2/train.py -c config.json -m run_name`
(/root/reference/vits2/train.py:39-55) and train_ms.py (multi-speaker is the
same path here — sid threading is driven by n_speakers in the config).

Usage:
  python -m torch_tts_tpu.cli.vits2_train -c configs/vits2-ljspeech.yaml \
      -m runs/ljspeech --data-root /path/to/LJSpeech-1.1
"""

from __future__ import annotations

import argparse
import logging
import os


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-c", "--config", required=True, help="config YAML/JSON")
    p.add_argument("-m", "--model-dir", required=True, help="run directory")
    p.add_argument("--data-root", default=None, help="LJSpeech root (metadata.csv + wavs/)")
    p.add_argument("--filelist", default=None, help="reference-format filelist instead of --data-root")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--val-size", type=int, default=100)
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO)

    from torch_tts_tpu.core.config import load_vits2_config
    from torch_tts_tpu.data.dataset import TextAudioDataset
    from torch_tts_tpu.train.vits2_trainer import VITS2Trainer

    cfg = load_vits2_config(args.config)
    os.makedirs(args.model_dir, exist_ok=True)
    # copy the config into the run dir for provenance (vits2/utils.py:202-207)
    with open(os.path.join(args.model_dir, "config" + os.path.splitext(args.config)[1]), "w") as f:
        f.write(open(args.config).read())

    use_mel = cfg.model.use_mel_posterior_encoder
    if args.filelist:
        full = TextAudioDataset.from_filelist(
            args.filelist, cfg.audio, cfg.data, use_mel=use_mel
        )
    elif args.data_root:
        full = TextAudioDataset.from_ljspeech(
            args.data_root, cfg.audio, cfg.data, use_mel=use_mel
        )
    else:
        p.error("one of --data-root / --filelist is required")

    val_size = min(args.val_size, max(1, len(full) // 20))
    eval_items = full.items[:val_size]
    train_items = full.items[val_size:]
    train_ds = TextAudioDataset(train_items, cfg.audio, cfg.data, use_mel=use_mel)
    eval_ds = TextAudioDataset(eval_items, cfg.audio, cfg.data, use_mel=use_mel)

    trainer = VITS2Trainer(cfg, args.model_dir, train_ds, eval_ds)
    trainer.train(epochs=args.epochs)


if __name__ == "__main__":
    main()
