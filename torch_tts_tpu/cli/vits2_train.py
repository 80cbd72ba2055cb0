"""VITS2 training CLI.

Equivalent of `python vits2/train.py -c config.json -m run_name`
(/root/reference/vits2/train.py:39-55) and train_ms.py (multi-speaker is the
same path here — sid threading is driven by n_speakers in the config), plus
the Lightning harness's multi-corpus assembly
(/root/reference/vits2/cli.py:92-108: ConcatDataset over several dataset
configs with a min(100, 5%) random val split): pass --filelist and/or
--data-root REPEATEDLY to concatenate corpora; --sid-offset shifts each
corpus's speaker ids above the previous ones so several single-speaker
corpora train as distinct speakers.

Usage:
  python -m torch_tts_tpu.cli.vits2_train -c configs/vits2-ljspeech.yaml \
      -m runs/ljspeech --data-root /path/to/LJSpeech-1.1
  python -m torch_tts_tpu.cli.vits2_train -c configs/vits2-multispeaker.yaml \
      -m runs/multi --filelist a.txt --filelist b.txt --sid-offset
"""

from __future__ import annotations

import argparse
import logging
import os


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-c", "--config", required=True, help="config YAML/JSON")
    p.add_argument("-m", "--model-dir", required=True, help="run directory")
    p.add_argument("--data-root", action="append", default=None,
                   help="LJSpeech root (metadata.csv + wavs/); repeatable")
    p.add_argument("--filelist", action="append", default=None,
                   help="reference-format filelist; repeatable")
    p.add_argument("--sid-offset", action="store_true",
                   help="shift each corpus's speaker ids above the previous "
                        "corpora's (multi-corpus multi-speaker)")
    p.add_argument("--val-seed", type=int, default=1234,
                   help="seed for the random train/val split")
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
    corpora = [
        TextAudioDataset.from_filelist(f, cfg.audio, cfg.data, use_mel=use_mel)
        for f in (args.filelist or ())
    ] + [
        TextAudioDataset.from_ljspeech(r, cfg.audio, cfg.data, use_mel=use_mel)
        for r in (args.data_root or ())
    ]
    if not corpora:
        p.error("one of --data-root / --filelist is required")
    if len(corpora) == 1 and not args.sid_offset:
        full = corpora[0]
    else:
        full = TextAudioDataset.concat(
            corpora, cfg.audio, cfg.data, sid_offset=args.sid_offset,
            use_mel=use_mel,
        )
        logging.info(
            "concatenated %d corpora -> %d utterances (sid_offset=%s)",
            len(corpora), len(full), args.sid_offset,
        )

    # fail fast on sid/config mismatches: XLA embedding gathers CLAMP
    # out-of-range ids (two speakers silently share a row) and a
    # single-speaker model (n_speakers<=1) builds no speaker table at all —
    # either way offset sids would train silently wrong
    max_sid = max((it.sid for it in full.items), default=0)
    if max_sid > 0 and cfg.model.n_speakers <= max_sid:
        p.error(
            f"speaker ids reach {max_sid} but the config has "
            f"n_speakers={cfg.model.n_speakers}; set model.n_speakers > "
            f"{max_sid} (multi-speaker) or drop --sid-offset"
        )

    # min(100, 5%) seeded-random val split (reference cli.py:104-108
    # random_split; the 5% floor keeps tiny corpora trainable)
    import numpy as np

    val_size = min(args.val_size, max(1, len(full) // 20))
    perm = np.random.default_rng(args.val_seed).permutation(len(full))
    eval_items = [full.items[i] for i in perm[:val_size]]
    train_items = [full.items[i] for i in perm[val_size:]]
    train_ds = TextAudioDataset(train_items, cfg.audio, cfg.data, use_mel=use_mel)
    eval_ds = TextAudioDataset(eval_items, cfg.audio, cfg.data, use_mel=use_mel)

    trainer = VITS2Trainer(cfg, args.model_dir, train_ds, eval_ds)
    trainer.train(epochs=args.epochs)


if __name__ == "__main__":
    main()
