"""VITS2 training loop: data feeding, stepping, logging, checkpointing.

The orchestration layer over train/vits2_train.py — the equivalent of
`run`/`train_and_evaluate` in /root/reference/vits2/train.py:58-528 (and its
multi-speaker twin train_ms.py, which differs only in sid threading):

- epoch loop over a DistributedBucketSampler whose buckets carry static
  padded shapes (one XLA executable per bucket instead of per batch shape)
- TB scalars at log_interval; eval + checkpoint (keep 3) at eval_interval
- resume-from-latest with lenient restore
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Iterable, Optional

import jax
import numpy as np

from torch_tts_tpu.core.config import VITS2Config
from torch_tts_tpu.data.dataset import TextAudioDataset, collate_batch
from torch_tts_tpu.data.sampler import DistributedBucketSampler
from torch_tts_tpu.models.vits2 import (
    DurationDiscriminatorV1,
    DurationDiscriminatorV2,
    MultiPeriodDiscriminator,
    SynthesizerTrn,
)
from torch_tts_tpu.parallel import make_mesh, replicate, shard_batch
from torch_tts_tpu.text import symbols
from torch_tts_tpu.train import checkpoint as ckpt
from torch_tts_tpu.train.async_checkpoint import AsyncCheckpointer
from torch_tts_tpu.train.vits2_train import create_train_state, make_train_step
from torch_tts_tpu.utils import logging_utils as lu

logger = logging.getLogger(__name__)

BUCKET_BOUNDARIES = [32, 300, 400, 500, 600, 700, 800, 900, 1000]


def build_models(cfg: VITS2Config):
    model = SynthesizerTrn(
        n_vocab=len(symbols),
        spec_channels=cfg.posterior_channels,
        segment_frames=cfg.segment_frames,
        cfg=cfg.model,
    )
    mpd = MultiPeriodDiscriminator(use_spectral_norm=cfg.model.use_spectral_norm)
    dur_disc = None
    if cfg.model.use_duration_discriminator:
        cls = (
            DurationDiscriminatorV1
            if cfg.model.duration_discriminator_type == "dur_disc_1"
            else DurationDiscriminatorV2
        )
        dur_disc = cls(cfg.model.hidden_channels)
    return model, mpd, dur_disc


class VITS2Trainer:
    def __init__(
        self,
        cfg: VITS2Config,
        model_dir: str,
        train_dataset: TextAudioDataset,
        eval_dataset: Optional[TextAudioDataset] = None,
        use_mesh: bool = True,
        bucket_boundaries: Optional[list] = None,
        pad_text_to: Optional[int] = None,
        eval_max_frames: int = 1000,
        use_native_loader: bool = False,
        native_workers: int = 4,
        async_ckpt: Optional[str] = "thread",
    ):
        self.eval_max_frames = eval_max_frames
        self.use_native_loader = use_native_loader
        # async_ckpt: "thread" (default — background msgpack writer, same
        # on-disk format), "orbax" (collective multi-host sharded saves), or
        # None (round-2 synchronous saver). See train/async_checkpoint.py.
        self.ckpt = (
            AsyncCheckpointer(async_ckpt) if async_ckpt is not None else None
        )
        self.native_workers = native_workers
        self._native_batchers = {}
        self.cfg = cfg
        self.model_dir = model_dir
        self.train_dataset = train_dataset
        self.eval_dataset = eval_dataset
        boundaries = bucket_boundaries or BUCKET_BOUNDARIES
        # all host-side artifacts (TB events, checkpoints, eval) are produced
        # by process 0 only — the reference gates the same work on rank 0
        # (vits2/train.py:64-65,434-528)
        self.is_lead = jax.process_index() == 0
        os.makedirs(model_dir, exist_ok=True)
        if self.is_lead:
            lu.check_git_hash(model_dir)
            self.writer = lu.make_writer(model_dir)
            self.writer_eval = lu.make_writer(os.path.join(model_dir, "eval"))
        else:
            self.writer = self.writer_eval = None

        self.model, self.mpd, self.dur_disc = build_models(cfg)
        self.mesh = make_mesh() if use_mesh else None
        # one sampler shard per host process (multi-host: each process feeds
        # its addressable slice of the data mesh; single-host: 1/0)
        self.sampler = DistributedBucketSampler(
            train_dataset.lengths,
            cfg.train.batch_size,
            boundaries,
            num_replicas=jax.process_count(),
            rank=jax.process_index(),
            shuffle=True,
        )
        steps_per_epoch = max(1, len(self.sampler))
        self.pad_text = pad_text_to or (
            cfg.data.max_text_len * (2 if cfg.data.add_blank else 1) + 1
        )
        sample_pad = self.sampler.pad_frames_for_bucket(0)
        sample = collate_batch(
            [train_dataset[i] for i in range(min(2, len(train_dataset)))],
            pad_text_to=self.pad_text,
            pad_frames_to=sample_pad,
        )
        self.state, self.tx = create_train_state(
            cfg, self.model, self.mpd, dur_disc=self.dur_disc,
            sample_batch={k: jax.numpy.asarray(v) for k, v in sample.items()},
            steps_per_epoch=steps_per_epoch,
        )
        self.step_fn = jax.jit(
            make_train_step(cfg, self.model, self.mpd, self.tx, dur_disc=self.dur_disc)
        )
        if self.mesh is not None:
            self.state = replicate(self.state, self.mesh)

        if self.ckpt is not None and self.ckpt.backend == "orbax":
            step0 = self.ckpt.latest_step(model_dir)
            if step0 is not None:
                logger.info("Resuming from orbax step %d", step0)
                self.state = self.ckpt.restore(model_dir, self.state)
        else:
            latest = ckpt.latest_checkpoint(model_dir)
            if latest:
                logger.info("Resuming from %s", latest)
                self.state = ckpt.restore_checkpoint(latest, self.state)

        self.rng = jax.random.PRNGKey(cfg.train.seed)
        self._eval_step = None  # jitted lazily on first evaluate()
        self._eval_infer = None  # jitted eval-time inference (see evaluate)

    def _make_batch(self, pad_frames: int, idxs):
        samples = [self.train_dataset[i] for i in idxs]
        batch = collate_batch(samples, pad_text_to=self.pad_text,
                              pad_frames_to=pad_frames)
        if self.mesh is not None:
            batch = shard_batch(batch, self.mesh)
        return batch

    # -- native (C++) prefetching data path --------------------------------

    def _native_batcher(self, pad_frames: int):
        """One libttsrt batcher per bucket (static padded shape)."""
        from torch_tts_tpu.data.native import NativeBatcher

        nb = self._native_batchers.get(pad_frames)
        if nb is None:
            nb = NativeBatcher(
                self.cfg.audio, self.cfg.train.batch_size, pad_frames,
                self.pad_text, num_workers=self.native_workers,
            )
            for it in self.train_dataset.items:
                nb.add_item(it.audio_path, self.train_dataset.get_text_ids(it.text))
            self._native_batchers[pad_frames] = nb
        return nb

    def _native_epoch(self, schedule):
        """Iterate (pad_frames, idxs) with one batch of lookahead per bucket:
        decode/extract runs on the C++ worker pool while the TPU steps."""
        schedule = list(schedule)
        for pad_frames, idxs in schedule[:1]:
            self._native_batcher(pad_frames).submit(list(idxs))
        for k, (pad_frames, idxs) in enumerate(schedule):
            nxt = schedule[k + 1] if k + 1 < len(schedule) else None
            if nxt is not None:
                self._native_batcher(nxt[0]).submit(list(nxt[1]))
            batch = self._native_batcher(pad_frames).next_batch()
            if batch is None:
                continue
            if self.mesh is not None:
                batch = shard_batch(batch, self.mesh)
            yield pad_frames, batch

    def train(self, epochs: Optional[int] = None,
              profile_steps: Optional[tuple] = None,
              profile_dir: Optional[str] = None) -> None:
        """Train. profile_steps=(start, stop) captures a jax.profiler trace of
        those steps into profile_dir (default <model_dir>/profile) — the
        tracing hook the reference lacks entirely (SURVEY.md §5)."""
        cfg = self.cfg
        epochs = epochs or cfg.train.epochs
        step = int(jax.device_get(self.state.step))
        # Resume is TRAJECTORY-EXACT at epoch boundaries: the per-step key is
        # fold_in(seed_key, state.step) (derived, not sequentially split — a
        # restored process rebuilds the identical stream), the sampler's
        # schedule is a pure function of (epoch, seed), and the epoch loop
        # restarts below at the epoch the restored step count implies. A
        # mid-epoch checkpoint rounds DOWN: the partial epoch is replayed
        # (same epoch-level granularity as the reference's
        # utils.load_checkpoint/epoch_str resume, vits2/train.py:255-263).
        # Verified bit-exact: tests/test_trainers_e2e.py
        # ::test_vits2_trainer_resume_trajectory_exact.
        steps_per_epoch = max(1, len(self.sampler))
        start_epoch = step // steps_per_epoch
        if step % steps_per_epoch:
            # mid-epoch checkpoint: round the step itself down too — the
            # reference does exactly this (global_step = (epoch_str - 1) *
            # len(train_loader), vits2/train.py:237). Keeping the inflated
            # step would permanently shift the step<->epoch arithmetic (and
            # compound on every later resume); state.step is synced so the
            # in-step MAS noise decay and rng folds see the same rounded
            # count the reference's global_step would.
            step = start_epoch * steps_per_epoch
            old = self.state.step
            new = jax.numpy.asarray(step, dtype=old.dtype)
            if self.mesh is not None and hasattr(old, "sharding"):
                new = jax.device_put(new, old.sharding)
            self.state = self.state.replace(step=new)
            logger.info(
                "mid-epoch checkpoint: step rounded down to the epoch "
                "boundary (%d) — replaying the partial epoch", step,
            )
        t_last = time.perf_counter()
        profiling = False
        # device-side skip counter; starts as a python float so the first add
        # adopts the (global, replicated) sharding of metrics["nonfinite"] —
        # a process-local zeros(()) would clash with global arrays on
        # multi-host
        nonfinite_acc = 0.0
        for epoch in range(start_epoch + 1, epochs + 1):
            self.sampler.set_epoch(epoch)
            if self.use_native_loader:
                epoch_iter = self._native_epoch(self.sampler)
            else:
                epoch_iter = (
                    (pf, self._make_batch(pf, idxs)) for pf, idxs in self.sampler
                )
            for pad_frames, batch in epoch_iter:
                if profile_steps and step == profile_steps[0] and not profiling:
                    jax.profiler.start_trace(
                        profile_dir or os.path.join(self.model_dir, "profile")
                    )
                    profiling = True
                # derived, not split: fold_in(seed, step) rebuilds the same
                # stream after a resume (the jitted step folds state.step in
                # again — harmless double discrimination)
                sub = jax.random.fold_in(self.rng, step)
                new_state, metrics = self.step_fn(self.state, batch, sub)
                # failure detection the reference lacks (SURVEY.md §5): the
                # jitted step itself drops non-finite updates
                # (vits2_train._guarded_update zeroes non-finite grads and
                # scales the optimizer updates by the finite flag — NOT a
                # full-tree jnp.where select, which defeats buffer donation
                # at +57% step time), so no per-step host sync is needed —
                # dispatch stays pipelined over the TPU tunnel. The skip
                # count accumulates lazily on device and is only fetched at
                # log_interval.
                self.state = new_state
                nonfinite_acc = nonfinite_acc + metrics["nonfinite"]
                step += 1
                if profiling and step >= profile_steps[1]:
                    jax.block_until_ready(metrics)
                    jax.profiler.stop_trace()
                    profiling = False
                if step % cfg.train.log_interval == 0:
                    m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                    dt = time.perf_counter() - t_last
                    t_last = time.perf_counter()
                    m["perf/steps_per_s"] = cfg.train.log_interval / dt
                    skipped = float(jax.device_get(nonfinite_acc))
                    nonfinite_acc = 0.0
                    m["perf/nonfinite_skipped"] = skipped
                    if skipped:
                        logger.warning(
                            "%d of the last %d steps had non-finite losses "
                            "(updates were skipped in-step)",
                            int(skipped), cfg.train.log_interval,
                        )
                    if skipped >= cfg.train.log_interval:
                        self._save(step)
                        if self.ckpt is not None:
                            self.ckpt.wait()
                        raise FloatingPointError(
                            "every step in the last log window had a "
                            "non-finite loss; state saved"
                        )
                    if self.is_lead:
                        lu.summarize(self.writer, step, scalars=m)
                    logger.info("step %d: %s", step,
                                {k: round(v, 4) for k, v in m.items()})
                if step % cfg.train.eval_interval == 0:
                    if self.is_lead:
                        self.evaluate(step)
                    self._save(step)
            logger.info("==== epoch %d done (step %d)", epoch, step)
        if self.ckpt is not None:
            # final barrier: the last checkpoint is durably on disk before
            # train() returns (async writes must not outlive the process)
            self.ckpt.wait()

    def _save(self, step: int) -> None:
        """Checkpoint dispatch: orbax saves are COLLECTIVE (every process
        calls — each writes its addressable shards); thread/sync saves are
        lead-gated like the reference's rank-0 writer."""
        keep = self.cfg.train.keep_ckpts
        if self.ckpt is not None and self.ckpt.backend == "orbax":
            self.ckpt.save(self.model_dir, step, self.state, keep=keep)
        elif self.is_lead:
            if self.ckpt is not None:
                self.ckpt.save(self.model_dir, step, self.state, keep=keep)
            else:
                ckpt.save_checkpoint(
                    self.model_dir, step, self.state, keep=keep
                )

    def evaluate(self, step: int) -> None:
        if self.eval_dataset is None or len(self.eval_dataset) == 0:
            return
        import jax.numpy as jnp

        from torch_tts_tpu.train.vits2_train import make_eval_step

        sample = collate_batch(
            [self.eval_dataset[i] for i in range(min(4, len(self.eval_dataset)))],
            pad_text_to=self.pad_text,
        )
        params = jax.device_get(self.state.params_g)

        # scalar eval-set losses (mel/kl/dur on the training-forward path) —
        # the generalization signal the reference's evaluate() lacks
        if self._eval_step is None:
            self._eval_step = jax.jit(make_eval_step(self.cfg, self.model))
        # params is a nested flax pytree — pass it whole (jit ingests numpy
        # leaves); jnp.asarray on the top-level dict values would raise
        eval_metrics = self._eval_step(
            params,
            {k: jnp.asarray(v) for k, v in sample.items()},
            jax.random.PRNGKey(0),
        )
        eval_scalars = {
            k: float(v) for k, v in jax.device_get(eval_metrics).items()
        }
        logger.info("eval step %d: %s", step,
                    {k: round(v, 4) for k, v in eval_scalars.items()})
        max_frames = self.eval_max_frames
        # jitted + cached: an unjitted full-decoder apply is hundreds of
        # tunnel round-trips (~10+ min per eval through the dev tunnel —
        # observed stalling the round-5 quality run); one compiled program
        # reuses across evals (shapes are fixed by pad_text/eval_max_frames)
        if self._eval_infer is None:
            def _infer(params, x, x_lengths, key):
                return self.model.apply(
                    {"params": params}, x, x_lengths,
                    noise_scale=0.667, noise_scale_w=0.8, length_scale=1.0,
                    max_frames=max_frames,
                    method=SynthesizerTrn.infer,
                    rngs={"noise": key, "dropout": jax.random.PRNGKey(0)},
                )
            self._eval_infer = jax.jit(_infer)
        audio, attn, y_mask, _aux, y_lengths = self._eval_infer(
            params,
            jnp.asarray(sample["x"]),
            jnp.asarray(sample["x_lengths"]),
            jax.random.PRNGKey(step),
        )
        audio = np.asarray(audio)
        y_lengths = np.asarray(y_lengths)
        hop = self.cfg.audio.hop_length
        audios = {
            f"gen/audio_{i}": audio[i, : y_lengths[i] * hop, 0]
            for i in range(audio.shape[0])
        }
        images = {
            f"gen/attn_{i}": lu.plot_alignment_to_numpy(np.asarray(attn[i]))
            for i in range(min(2, audio.shape[0]))
        }
        lu.summarize(
            self.writer_eval, step, scalars=eval_scalars, images=images,
            audios=audios, audio_sampling_rate=self.cfg.audio.sampling_rate,
        )
