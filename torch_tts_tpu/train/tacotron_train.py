"""Tacotron training: jitted step + hand-rolled trainer.

Equivalent of the reference Trainer (/root/reference/tacotron/train_util.py:
58-251): AdamW, global-norm gradient clipping at 1.0, gradient accumulation
via optax.MultiSteps (the `optimizer_interval` flag), epoch loop with eval +
alignment-image dump, single checkpoint with step/model/optimizer state.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from torch_tts_tpu.core.config import TacotronConfig
from torch_tts_tpu.core.masks import sequence_mask
from torch_tts_tpu.models.tacotron import Tacotron, build_tacotron
from torch_tts_tpu.models.tacotron.losses import tacotron_loss
from torch_tts_tpu.train import checkpoint as ckpt
from torch_tts_tpu.utils import logging_utils as lu

logger = logging.getLogger(__name__)


@struct.dataclass
class TacoTrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt: Any


def make_optimizer(lr: float = 1e-3, accum_steps: int = 1):
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(lr))
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def create_train_state(
    cfg: TacotronConfig,
    model: Tacotron,
    sample_batch: Dict[str, jax.Array],
    lr: float = 1e-3,
    accum_steps: int = 1,
    rng: Optional[jax.Array] = None,
):
    rng = rng if rng is not None else jax.random.PRNGKey(42)
    k1, k2, k3 = jax.random.split(rng, 3)
    b = sample_batch
    use_ref = cfg.model.style_dim_vae is not None
    variables = model.init(
        {"params": k1, "noise": k2, "dropout": k3},
        b["c"], b["c_lengths"], b["x"], b["x_lengths"],
        xref=b["x"] if use_ref else None,
        xref_lengths=b["x_lengths"] if use_ref else None,
        train=True, deterministic=False,
    )
    tx = make_optimizer(lr, accum_steps)
    state = TacoTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt=tx.init(variables["params"]),
    )
    return state, tx


def make_train_step(cfg: TacotronConfig, model: Tacotron, tx):
    use_ref = cfg.model.style_dim_vae is not None

    def train_step(state: TacoTrainState, batch, rng):
        c, c_lengths = batch["c"], batch["c_lengths"]
        x, x_lengths = batch["x"], batch["x_lengths"]
        k_noise, k_drop = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                c, c_lengths, x, x_lengths,
                xref=x if use_ref else None,
                xref_lengths=x_lengths if use_ref else None,
                train=True, deterministic=False,
                mutable=["batch_stats"],
                rngs={"noise": k_noise, "dropout": k_drop},
            )
            y, y_post, s, aux = out
            xmask = sequence_mask(x_lengths, x.shape[1])
            loss, metrics = tacotron_loss(
                y, y_post, s, x, xmask, aux["w"], aux["kl_loss"]
            )
            return loss, (metrics, mutated.get("batch_stats", state.batch_stats))

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt = tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = jnp.sqrt(
            sum(jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads))
        )
        return (
            TacoTrainState(
                step=state.step + 1, params=params, batch_stats=new_bs, opt=opt
            ),
            metrics,
        )

    return train_step


def make_eval_step(cfg: TacotronConfig, model: Tacotron):
    def eval_step(state: TacoTrainState, batch, rng):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["c"], batch["c_lengths"], batch["x"], batch["x_lengths"],
            train=False, deterministic=True,
            rngs={"noise": rng, "dropout": rng},
        )
        y, y_post, s, aux = out
        xmask = sequence_mask(batch["x_lengths"], batch["x"].shape[1])
        loss, metrics = tacotron_loss(
            y, y_post, s, batch["x"], xmask, aux["w"], aux["kl_loss"]
        )
        return metrics, aux["w"]

    return eval_step


class TacotronTrainer:
    """Epoch loop with checkpoint/resume and per-epoch alignment snapshots
    (train_util.py:209-251 semantics; 600 epochs x steps_per_epoch)."""

    def __init__(
        self,
        cfg: TacotronConfig,
        model_dir: str,
        lr: float = 1e-3,
        accum_steps: int = 1,
    ):
        self.cfg = cfg
        self.model_dir = model_dir
        self.model = build_tacotron(cfg)
        self.lr = lr
        self.accum_steps = accum_steps
        os.makedirs(model_dir, exist_ok=True)
        self.writer = lu.make_writer(model_dir)
        self.state = None
        self.tx = None
        self.step_fn = None
        self.eval_fn = None
        self.rng = jax.random.PRNGKey(0)

    def setup(self, sample_batch):
        self.state, self.tx = create_train_state(
            self.cfg, self.model, sample_batch, lr=self.lr,
            accum_steps=self.accum_steps,
        )
        self.step_fn = jax.jit(make_train_step(self.cfg, self.model, self.tx))
        self.eval_fn = jax.jit(make_eval_step(self.cfg, self.model))
        latest = ckpt.latest_checkpoint(self.model_dir)
        if latest:
            logger.info("Resuming from %s", latest)
            self.state = ckpt.restore_checkpoint(latest, self.state)

    def train(
        self,
        train_batches: Iterable[Dict[str, np.ndarray]],
        eval_batches: Optional[Iterable[Dict[str, np.ndarray]]] = None,
        num_epochs: int = 600,
        log_interval: int = 10,
    ):
        if self.state is None:
            # setup (and its checkpoint restore) needs a sample batch; take
            # one eagerly so the resume arithmetic below sees the restored
            # step instead of assuming a fresh run
            it = iter(train_batches)
            first = next(it, None)
            if first is None:
                return
            self.setup(first)
            if it is train_batches:
                # one-shot iterator: put the setup batch back so it is
                # trained on, not silently dropped
                import itertools

                train_batches = itertools.chain([first], it)
                if num_epochs > 1:
                    logger.warning(
                        "train_batches is a one-shot iterator; epochs after "
                        "the first will see it exhausted — pass a "
                        "re-iterable for multi-epoch training")
        step = int(jax.device_get(self.state.step))
        # epoch-boundary-exact resume, same discipline as VITS2Trainer: the
        # per-step key is derived (fold_in(seed, step)), and when the batch
        # schedule is sized the epoch loop fast-forwards past completed epochs
        try:
            steps_per_epoch = len(train_batches)
        except TypeError:
            steps_per_epoch = None
        if steps_per_epoch:
            start_epoch = step // steps_per_epoch
        else:
            start_epoch = 0
            if step:
                logger.warning(
                    "resumed at step %d but the batch iterable has no len(); "
                    "cannot fast-forward past completed epochs — running "
                    "%d epochs from here (checkpoints keep the true step)",
                    step, num_epochs,
                )
        for epoch in range(start_epoch, num_epochs):
            for batch in train_batches:
                sub = jax.random.fold_in(self.rng, step)
                self.state, metrics = self.step_fn(self.state, batch, sub)
                step += 1
                if step % log_interval == 0:
                    m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                    lu.summarize(self.writer, step, scalars=m)
            if eval_batches is not None:
                self.evaluate(eval_batches, step)
            ckpt.save_checkpoint(self.model_dir, step, self.state, keep=3)

    def evaluate(self, eval_batches, step: int):
        losses = []
        w_last = None
        # derived eval keys: evaluation must not advance the training rng
        # stream (it would make the trajectory depend on eval cadence and
        # break trajectory-exact resume)
        # offset into the upper uint32 half: disjoint from train-step folds
        eval_key = jax.random.fold_in(self.rng, 2**31 + step)
        for i, batch in enumerate(eval_batches):
            sub = jax.random.fold_in(eval_key, i)
            metrics, w = self.eval_fn(self.state, batch, sub)
            losses.append(float(metrics["loss"]))
            w_last = w
        lu.summarize(
            self.writer, step,
            scalars={"eval/loss": float(np.mean(losses))},
            images={"eval/alignment": lu.plot_alignment_to_numpy(np.asarray(w_last[0]))},
        )
