"""Tacotron training CLI.

Equivalent of `python tacotron/train.py dataset.h5 config.yaml [flags]`
(/root/reference/tacotron/train.py:104-171): eval holdout split, length
bucketing, AdamW training with gradient accumulation, checkpoint/resume.
"""

from __future__ import annotations

import argparse
import logging


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset", help="HDF5 dataset (from tacotron_prepare)")
    p.add_argument("config", help="tacotron config YAML")
    p.add_argument("--run-dir", default="runs/tacotron")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--eval-batch-size", type=int, default=32)
    p.add_argument("--eval-size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=600)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--optimizer-interval", type=int, default=1,
                   help="gradient accumulation steps")
    p.add_argument("--max-audio-frames", type=int, default=None)
    p.add_argument("--filter", default=None, metavar="SCORES_OUT",
                   help="instead of training, score every utterance's "
                        "alignment crispness with the current checkpoint and "
                        "write 'utt_id score' lines (reference train.py:81-101 "
                        "dataset filter mode)")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import numpy as np

    from torch_tts_tpu.core.config import load_tacotron_config
    from torch_tts_tpu.data.sampler import LengthBucketRandomSampler
    from torch_tts_tpu.data.tacotron_dataset import TacotronDatasetHDF5, collate_tacotron
    from torch_tts_tpu.text.encoder import TextEncoder
    from torch_tts_tpu.train.tacotron_train import TacotronTrainer

    cfg = load_tacotron_config(args.config)
    enc = TextEncoder(
        cfg.text.alphabet, cfg.text.character_map,
        cfg.text.bos_symbols or None, cfg.text.eos_symbols or None,
    )
    ds = TacotronDatasetHDF5(args.dataset, enc, max_frames=args.max_audio_frames)

    n_eval = min(args.eval_size, len(ds) // 10)
    eval_idx = list(range(n_eval))
    train_idx = list(range(n_eval, len(ds)))
    train_lengths = [ds.lengths[i] for i in train_idx]

    r = cfg.model.r
    # static shapes: pad text/frames to dataset maxima rounded to multiples
    pad_c = 16 * ((max(len(ds[i]["c"]) for i in range(min(64, len(ds)))) + 15) // 16 + 4)
    max_fr = args.max_audio_frames or max(ds.lengths)
    pad_x = r * ((max_fr + r - 1) // r)

    def batches(idx_list, lengths, batch_size):
        sampler = LengthBucketRandomSampler(lengths, batch_size, seed=0)
        for batch_ids in sampler:
            samples = [ds[idx_list[i]] for i in batch_ids]
            yield collate_tacotron(samples, pad_text_to=pad_c,
                                   pad_frames_to=pad_x, r=r)

    trainer = TacotronTrainer(cfg, args.run_dir, lr=args.lr,
                              accum_steps=args.optimizer_interval)

    if args.filter:
        import jax

        all_idx = list(range(len(ds)))
        first = collate_tacotron([ds[i] for i in all_idx[: args.batch_size]],
                                 pad_text_to=pad_c, pad_frames_to=pad_x, r=r)
        trainer.setup(first)
        scores = {}
        for start in range(0, len(all_idx), args.batch_size):
            chunk = all_idx[start : start + args.batch_size]
            samples = [ds[i] for i in chunk]
            batch = collate_tacotron(samples, pad_text_to=pad_c,
                                     pad_frames_to=pad_x, r=r)
            _metrics, w = trainer.eval_fn(
                trainer.state, batch, jax.random.PRNGKey(0)
            )
            w = np.asarray(w)  # [B, S, L]
            for bi, i in enumerate(chunk):
                S = max(1, int(batch["x_lengths"][bi]) // r)
                crisp = float(w[bi, :S].max(axis=1).mean())
                scores[ds.utt_ids[i]] = crisp
        with open(args.filter, "w") as f:
            for utt, s in sorted(scores.items(), key=lambda kv: kv[1]):
                f.write(f"{utt}\t{s:.4f}\n")
        print(f"wrote {len(scores)} alignment-crispness scores to {args.filter}")
        return

    class EpochIterable:
        def __init__(self, idx, lengths, bs):
            self.idx, self.lengths, self.bs = idx, lengths, bs

        def __iter__(self):
            return batches(self.idx, self.lengths, self.bs)

        def __len__(self):
            # sized so TacotronTrainer.train can fast-forward completed
            # epochs on resume (LengthBucketRandomSampler batch count)
            return (len(self.idx) + self.bs - 1) // self.bs

    eval_lengths = [ds.lengths[i] for i in eval_idx]
    trainer.train(
        EpochIterable(train_idx, train_lengths, args.batch_size),
        EpochIterable(eval_idx, eval_lengths, args.eval_batch_size) if n_eval else None,
        num_epochs=args.epochs,
    )


if __name__ == "__main__":
    main()
