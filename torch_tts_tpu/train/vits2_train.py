"""VITS2 GAN training: one jitted step updating G, D, and (optionally) the
duration discriminator.

Replicates the reference's step structure (/root/reference/vits2/train.py:
312-432) in pure-functional form:

  1. generator forward (MAS + SDP + random segment -> HiFi-GAN)
  2. D step on (real slice, stop_grad(y_hat))
  3. optional duration-discriminator step on detached (hidden_x, logw_, logw)
  4. G step through the *updated* D (the reference's optim order), with
     loss = gen + fm + c_mel * mel_l1 + dur + c_kl * kl

Gradient behavior matches the reference: `clip_grad_value_(params, None)`
only *measures* the grad norm (vits2/commons.py:148-163), so no clipping is
applied — norms are returned as metrics. AdamW with per-epoch exponential LR
decay mirrors train.py:197-247.

Data parallelism: the whole step is jit-compiled; feed it a batch sharded
over the mesh `data` axis and replicated params (parallel/mesh.py) and GSPMD
inserts the gradient all-reduces over ICI.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from torch_tts_tpu.audio import mel as melmod
from torch_tts_tpu.core.config import VITS2Config
from torch_tts_tpu.core.masks import slice_segments
from torch_tts_tpu.models.vits2.losses import (
    discriminator_loss,
    feature_loss,
    generator_loss,
    kl_loss,
)


@struct.dataclass
class TrainState:
    step: jax.Array
    params_g: Any
    opt_g: Any
    params_d: Any
    opt_d: Any
    params_dur: Any = None
    opt_dur: Any = None


def global_norm(tree) -> jax.Array:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def make_optimizer(cfg: VITS2Config, steps_per_epoch: int = 1000, inner=None):
    """AdamW + per-epoch exponential decay (train.py:197-206, 242-247).

    cfg.train.grad_accum > 1 wraps the optimizer in optax.MultiSteps: k
    micro-batch gradients are averaged before one real update — exactly the
    reference's `accumulate_grad` recipe (vits2/cli.py:255-262,338-356,
    manual_backward(loss * 1/k) summed over k micro-batches == the mean
    gradient), applied per optimizer (G, D, and the duration discriminator
    each accumulate independently at frozen params). The inner optimizer's
    step count advances once per *real* update, so transition_steps is
    divided by k to keep the per-epoch LR decay cadence (the reference steps
    ExponentialLR per epoch regardless of accumulation).

    `inner` injects a custom inner optimizer (tests use plain SGD so the
    averaged-update algebra is exactly checkable); the MultiSteps wrap still
    applies.
    """
    k = max(1, int(getattr(cfg.train, "grad_accum", 1)))
    if inner is None:
        lr = optax.exponential_decay(
            init_value=cfg.train.learning_rate,
            transition_steps=max(1, steps_per_epoch // k),
            decay_rate=cfg.train.lr_decay,
            staircase=True,
        )
        inner = optax.adamw(
            lr,
            b1=cfg.train.betas[0],
            b2=cfg.train.betas[1],
            eps=cfg.train.eps,
            weight_decay=0.01,
        )
    if k > 1:
        inner = optax.MultiSteps(inner, every_k_schedule=k)
    return inner


def create_train_state(
    cfg: VITS2Config,
    model,
    mpd,
    dur_disc=None,
    rng: Optional[jax.Array] = None,
    steps_per_epoch: int = 1000,
    sample_batch: Optional[Dict[str, jax.Array]] = None,
    tx=None,
    jit_init: bool = True,
) -> Tuple[TrainState, Any]:
    """Initialize all networks + optimizers. Returns (state, optimizer).

    `tx` overrides the optimizer (must already include any MultiSteps wrap —
    use make_optimizer(cfg, inner=...) to build it).

    `jit_init=False` runs the flax initializers eagerly — on a local CPU
    backend op-by-op dispatch is cheap and it skips two full XLA compiles of
    the training forward; keep the default (jitted) on the tunneled TPU where
    per-op round-trips dominate."""
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.train.seed)
    k_g, k_d, k_dur, k_noise, k_drop = jax.random.split(rng, 5)
    b = sample_batch
    init_rngs = {"params": k_g, "noise": k_noise, "dropout": k_drop}
    if tx is None:
        tx = make_optimizer(cfg, steps_per_epoch)
    sid = b.get("sid") if cfg.model.n_speakers > 1 else None
    # jit the initializers: one compiled program instead of thousands of
    # op-by-op dispatches (matters a lot on remote/tunneled devices)
    init_g = lambda: model.init(
        init_rngs, b["x"], b["x_lengths"], b["spec"], b["spec_lengths"], sid=sid
    )
    vars_g = jax.jit(init_g)() if jit_init else init_g()
    params_g = vars_g["params"]

    seg = cfg.model.segment_size
    dummy_wav = jnp.zeros((b["x"].shape[0], seg, 1))
    init_d = lambda: mpd.init({"params": k_d}, dummy_wav, dummy_wav)
    vars_d = jax.jit(init_d)() if jit_init else init_d()
    params_d = vars_d["params"]

    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g,
        opt_g=tx.init(params_g),
        params_d=params_d,
        opt_d=tx.init(params_d),
    )
    if dur_disc is not None:
        h = cfg.model.hidden_channels
        t_x = b["x"].shape[1]
        dummy_h = jnp.zeros((b["x"].shape[0], t_x, h))
        dummy_m = jnp.ones((b["x"].shape[0], t_x, 1))
        dummy_w = jnp.zeros((b["x"].shape[0], t_x, 1))
        vars_dur = dur_disc.init({"params": k_dur}, dummy_h, dummy_m, dummy_w, dummy_w)
        params_dur = vars_dur["params"]
        state = state.replace(params_dur=params_dur, opt_dur=tx.init(params_dur))
    return state, tx


def make_train_step(cfg: VITS2Config, model, mpd, tx, dur_disc=None):
    """Build the jitted train step closure. All config is static."""
    a = cfg.audio
    seg_frames = cfg.segment_frames
    seg_samples = cfg.model.segment_size
    hop = a.hop_length
    use_mel_post = cfg.model.use_mel_posterior_encoder
    use_noise_mas = cfg.model.use_noise_scaled_mas
    c_mel = cfg.train.c_mel
    c_kl = cfg.train.c_kl
    c_fm = cfg.train.c_fm
    c_dur = cfg.train.c_dur
    multispeaker = cfg.model.n_speakers > 1
    use_bf16 = cfg.train.use_bf16

    def _cast(tree):
        """fp32 -> bf16 for network compute; master params stay fp32."""
        if not use_bf16:
            return tree
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            tree,
        )

    def _mel_of_wav(wav_sq):  # [B, L] -> [B, T, n_mels]
        return melmod.mel_spectrogram(
            wav_sq, a.filter_length, a.n_mel_channels, a.sampling_rate,
            hop, a.win_length, a.mel_fmin, a.mel_fmax,
        )

    skip_nonfinite = getattr(cfg.train, "skip_nonfinite", True)

    def _guarded_update(loss, grads, opt_state, params):
        """Skip-on-non-finite folded into the jitted step (SURVEY.md §5
        failure detection, beyond the reference): the training loop never has
        to host-sync on the loss value, preserving pipelined dispatch over
        the TPU tunnel.

        Formulated donation-friendly: gradients are zeroed when the loss or
        any gradient is non-finite, and the optimizer's resulting updates are
        scaled to zero, so parameters stay bit-identical through the ordinary
        in-place `params + update` path. (The obvious alternative — a
        full-tree jnp.where select of new-vs-old state — keeps BOTH state
        copies alive, defeats XLA buffer donation, and measured +57% step
        time on v5e.) On a skipped step the optimizer's EMA state decays once
        toward zero and its count advances — bounded, finite, and documented.
        With grad_accum > 1 (MultiSteps) a non-finite micro-batch contributes
        a zero gradient to the window average; if it lands on the window
        boundary the boundary update is additionally zeroed, dropping that
        window's update (safe, documented loss of one window).
        Returns (new_params, new_opt_state, ok)."""
        if not skip_nonfinite:
            upd, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, upd), new_opt, jnp.bool_(True)
        ok = jnp.isfinite(loss) & jnp.isfinite(global_norm(grads))
        grads = jax.tree.map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads
        )
        upd, new_opt = tx.update(grads, opt_state, params)
        okf = ok.astype(jnp.float32)
        upd = jax.tree.map(lambda u: u * okf.astype(u.dtype), upd)
        return optax.apply_updates(params, upd), new_opt, ok

    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        x, x_lengths = batch["x"], batch["x_lengths"]
        spec, spec_lengths = batch["spec"], batch["spec_lengths"]
        wav = batch["wav"]  # [B, L, 1]
        sid = batch.get("sid") if multispeaker else None

        k_noise, k_drop = jax.random.split(jax.random.fold_in(rng, state.step), 2)
        g_rngs = {"noise": k_noise, "dropout": k_drop}

        if use_noise_mas:
            mas_noise = jnp.maximum(
                cfg.model.mas_noise_scale_initial
                - cfg.model.noise_scale_delta * state.step,
                0.0,
            )
        else:
            mas_noise = None

        def gen_forward(params_g):
            return model.apply(
                {"params": _cast(params_g)},
                x, x_lengths, _cast(spec), spec_lengths, sid=sid,
                mas_noise_scale=mas_noise, deterministic=False, rngs=g_rngs,
            )

        # ---- 1. generator forward (for the D step) ----
        out = gen_forward(state.params_g)
        (y_hat, l_length, attn, ids_slice, x_mask, z_mask, latents, dur_t) = out
        hx, logw, logw_ = dur_t
        y_slice = slice_segments(wav, ids_slice * hop, seg_samples)

        mel = spec if use_mel_post else melmod.spec_to_mel(
            spec, a.filter_length, a.n_mel_channels, a.sampling_rate,
            a.mel_fmin, a.mel_fmax,
        )
        y_mel = slice_segments(mel, ids_slice, seg_frames)

        # ---- 2. discriminator step ----
        y_hat_sg = jax.lax.stop_gradient(y_hat)

        def d_loss_fn(params_d):
            y_d_r, y_d_g, _, _ = mpd.apply(
                {"params": _cast(params_d)}, _cast(y_slice), y_hat_sg
            )
            loss_disc, r_l, g_l = discriminator_loss(y_d_r, y_d_g)
            return loss_disc, (r_l, g_l)

        (loss_disc, _), grads_d = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.params_d
        )
        params_d, opt_d, ok_d = _guarded_update(
            loss_disc, grads_d, state.opt_d, state.params_d
        )

        # ---- 3. duration discriminator step (optional) ----
        metrics_extra = {}
        ok_dur = jnp.bool_(True)
        params_dur, opt_dur = state.params_dur, state.opt_dur
        if dur_disc is not None:
            hx_sg = jax.lax.stop_gradient(hx)
            xm_sg = jax.lax.stop_gradient(x_mask)
            logw_sg = jax.lax.stop_gradient(logw)
            logw__sg = jax.lax.stop_gradient(logw_)

            def dur_loss_fn(p):
                prob_r, prob_g = dur_disc.apply(
                    {"params": _cast(p)}, hx_sg, xm_sg, logw__sg, logw_sg
                )
                loss, _, _ = discriminator_loss([prob_r], [prob_g])
                return loss

            loss_dur_disc, grads_dur = jax.value_and_grad(dur_loss_fn)(params_dur)
            params_dur, opt_dur, ok_dur = _guarded_update(
                loss_dur_disc, grads_dur, state.opt_dur, params_dur
            )
            metrics_extra = {
                "loss/dur_disc": loss_dur_disc,
                "grad_norm_dur_disc": global_norm(grads_dur),
            }

        # ---- 4. generator step (through the updated D) ----
        def g_loss_fn(params_g):
            out2 = gen_forward(params_g)
            (y_hat2, l_length2, _attn, ids2, _xm, z_mask2, latents2, dur_t2) = out2
            _hx2, logw2, logw_2 = dur_t2
            z2, z_p2, m_p2, logs_p2, m_q2, logs_q2 = latents2
            y_mel2 = slice_segments(mel, ids2, seg_frames)
            y_slice2 = slice_segments(wav, ids2 * hop, seg_samples)
            y_hat_mel = _mel_of_wav(y_hat2[..., 0].astype(jnp.float32))

            _, y_d_g, fmap_r, fmap_g = mpd.apply(
                {"params": _cast(params_d)}, _cast(y_slice2), y_hat2
            )
            loss_dur = jnp.sum(l_length2.astype(jnp.float32))
            loss_mel = jnp.mean(jnp.abs(y_mel2 - y_hat_mel)) * c_mel
            loss_kl = kl_loss(z_p2, logs_q2, m_p2, logs_p2, z_mask2) * c_kl
            loss_fm = feature_loss(fmap_r, fmap_g)
            loss_gen, _ = generator_loss(y_d_g)
            loss_all = loss_gen + loss_fm + loss_mel + loss_dur + loss_kl
            if dur_disc is not None:
                prob_r, prob_g = dur_disc.apply(
                    {"params": _cast(params_dur)}, _hx2, _xm, logw_2, logw2
                )
                loss_dur_gen, _ = generator_loss([prob_g])
                loss_all = loss_all + loss_dur_gen
            aux = {
                "loss/g/total": loss_all,
                "loss/g/gen": loss_gen,
                "loss/g/fm": loss_fm,
                "loss/g/mel": loss_mel,
                "loss/g/dur": loss_dur,
                "loss/g/kl": loss_kl,
            }
            return loss_all, aux

        (loss_g, aux_g), grads_g = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.params_g
        )
        params_g, opt_g, ok_g = _guarded_update(
            loss_g, grads_g, state.opt_g, state.params_g
        )

        ok_all = ok_g & ok_d & ok_dur
        new_state = state.replace(
            step=state.step + ok_all.astype(state.step.dtype),
            params_g=params_g,
            opt_g=opt_g,
            params_d=params_d,
            opt_d=opt_d,
            params_dur=params_dur,
            opt_dur=opt_dur,
        )
        metrics = {
            "loss/d/total": loss_disc,
            "grad_norm_d": global_norm(grads_d),
            "grad_norm_g": global_norm(grads_g),
            "nonfinite": 1.0 - ok_all.astype(jnp.float32),
            **aux_g,
            **metrics_extra,
        }
        return new_state, metrics

    def train_step_lightning(state: TrainState, batch, rng: jax.Array):
        """cli.py step (vits2/cli.py:312-356): one generator forward — G
        updates against the current D, then D trains on the detached audio.
        Loss weighting is also cli.py's: gen/disc losses are MEANed over the
        sub-discriminators (vs train.py's sum) and the total G loss is
        normalized by (1 + c_fm + c_dur + c_kl + c_mel) (cli.py:325-337).
        The optional duration-discriminator term (absent from cli.py, where
        it is commented out at :237-253) joins the numerator with weight 1."""
        x, x_lengths = batch["x"], batch["x_lengths"]
        spec, spec_lengths = batch["spec"], batch["spec_lengths"]
        wav = batch["wav"]
        sid = batch.get("sid") if multispeaker else None
        k_noise, k_drop = jax.random.split(jax.random.fold_in(rng, state.step), 2)
        g_rngs = {"noise": k_noise, "dropout": k_drop}
        mas_noise = (
            jnp.maximum(
                cfg.model.mas_noise_scale_initial
                - cfg.model.noise_scale_delta * state.step, 0.0,
            )
            if use_noise_mas else None
        )
        mel = spec if use_mel_post else melmod.spec_to_mel(
            spec, a.filter_length, a.n_mel_channels, a.sampling_rate,
            a.mel_fmin, a.mel_fmax,
        )

        def g_loss_fn(params_g):
            out = model.apply(
                {"params": _cast(params_g)},
                x, x_lengths, _cast(spec), spec_lengths, sid=sid,
                mas_noise_scale=mas_noise, deterministic=False, rngs=g_rngs,
            )
            (y_hat, l_length, _attn, ids, x_mask, z_mask, latents, dur_t) = out
            hx, logw, logw_ = dur_t
            _z, z_p, m_p, logs_p, _mq, logs_q = latents
            y_mel = slice_segments(mel, ids, seg_frames)
            y_slice = slice_segments(wav, ids * hop, seg_samples)
            y_hat_mel = _mel_of_wav(y_hat[..., 0].astype(jnp.float32))
            _, y_d_g, fmap_r, fmap_g = mpd.apply(
                {"params": _cast(state.params_d)}, _cast(y_slice), y_hat
            )
            loss_dur = jnp.sum(l_length.astype(jnp.float32))
            loss_mel = jnp.mean(jnp.abs(y_mel - y_hat_mel))
            loss_kl = kl_loss(z_p, logs_q, m_p, logs_p, z_mask)
            loss_fm = feature_loss(fmap_r, fmap_g)
            _, gen_per = generator_loss(y_d_g)
            loss_gen = jnp.mean(gen_per)  # cli.py:314 mean, not sum
            loss_all = (
                loss_gen
                + c_fm * loss_fm
                + c_dur * loss_dur
                + c_kl * loss_kl
                + c_mel * loss_mel
            ) / (1.0 + c_fm + c_dur + c_kl + c_mel)
            if dur_disc is not None:
                _pr, prob_g = dur_disc.apply(
                    {"params": _cast(state.params_dur)}, hx, x_mask, logw_, logw
                )
                loss_dur_gen, _ = generator_loss([prob_g])
                loss_all = loss_all + loss_dur_gen
            aux = {
                "loss/g/total": loss_all,
                "loss/g/gen": loss_gen,
                "loss/g/fm": loss_fm,
                "loss/g/mel": loss_mel,
                "loss/g/dur": loss_dur,
                "loss/g/kl": loss_kl,
                "_y_hat": jax.lax.stop_gradient(y_hat),
                "_y_slice": jax.lax.stop_gradient(y_slice),
                "_hx": jax.lax.stop_gradient(hx),
                "_x_mask": jax.lax.stop_gradient(x_mask),
                "_logw": jax.lax.stop_gradient(logw),
                "_logw_": jax.lax.stop_gradient(logw_),
            }
            return loss_all, aux

        (loss_g, aux_g), grads_g = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.params_g
        )
        params_g, opt_g, ok_g = _guarded_update(
            loss_g, grads_g, state.opt_g, state.params_g
        )

        y_hat_sg = aux_g.pop("_y_hat")
        y_slice = aux_g.pop("_y_slice")
        hx_sg = aux_g.pop("_hx")
        xm_sg = aux_g.pop("_x_mask")
        logw_sg = aux_g.pop("_logw")
        logw__sg = aux_g.pop("_logw_")

        def d_loss_fn(params_d):
            y_d_r, y_d_g, _, _ = mpd.apply(
                {"params": _cast(params_d)}, _cast(y_slice), y_hat_sg
            )
            _, r_l, g_l = discriminator_loss(y_d_r, y_d_g)
            return jnp.mean(r_l) + jnp.mean(g_l)  # cli.py:350 mean, not sum

        loss_disc, grads_d = jax.value_and_grad(d_loss_fn)(state.params_d)
        params_d, opt_d, ok_d = _guarded_update(
            loss_disc, grads_d, state.opt_d, state.params_d
        )

        metrics_extra = {}
        ok_dur = jnp.bool_(True)
        params_dur, opt_dur = state.params_dur, state.opt_dur
        if dur_disc is not None:
            def dur_loss_fn(p):
                prob_r, prob_g = dur_disc.apply(
                    {"params": _cast(p)}, hx_sg, xm_sg, logw__sg, logw_sg
                )
                loss, _, _ = discriminator_loss([prob_r], [prob_g])
                return loss

            loss_dur_disc, grads_dur = jax.value_and_grad(dur_loss_fn)(params_dur)
            params_dur, opt_dur, ok_dur = _guarded_update(
                loss_dur_disc, grads_dur, state.opt_dur, params_dur
            )
            metrics_extra = {
                "loss/dur_disc": loss_dur_disc,
                "grad_norm_dur_disc": global_norm(grads_dur),
            }

        ok_all = ok_g & ok_d & ok_dur
        new_state = state.replace(
            step=state.step + ok_all.astype(state.step.dtype),
            params_g=params_g, opt_g=opt_g,
            params_d=params_d, opt_d=opt_d,
            params_dur=params_dur, opt_dur=opt_dur,
        )
        metrics = {
            "loss/d/total": loss_disc,
            "grad_norm_d": global_norm(grads_d),
            "grad_norm_g": global_norm(grads_g),
            "nonfinite": 1.0 - ok_all.astype(jnp.float32),
            **aux_g,
            **metrics_extra,
        }
        return new_state, metrics

    if getattr(cfg.train, "step_order", "ddp") == "lightning":
        return train_step_lightning
    return train_step


def make_eval_step(cfg: VITS2Config, model):
    """Generator losses on a held-out batch (no updates, no discriminators).

    The reference's evaluate() only logs inference samples
    (/root/reference/vits2/train.py:535-594) — this adds the scalar
    generalization signal it lacks: eval-set mel / KL / duration losses from
    the same training-forward path, deterministically seeded.
    """
    a = cfg.audio
    seg_frames = cfg.segment_frames
    use_mel_post = cfg.model.use_mel_posterior_encoder
    multispeaker = cfg.model.n_speakers > 1
    c_mel, c_kl = cfg.train.c_mel, cfg.train.c_kl

    def eval_step(params_g, batch: Dict[str, jax.Array], rng: jax.Array):
        sid = batch.get("sid") if multispeaker else None
        k_noise, k_drop = jax.random.split(rng, 2)
        out = model.apply(
            {"params": params_g},
            batch["x"], batch["x_lengths"], batch["spec"],
            batch["spec_lengths"], sid=sid,
            mas_noise_scale=None, deterministic=True,
            rngs={"noise": k_noise, "dropout": k_drop},
        )
        (y_hat, l_length, _attn, ids, _xm, z_mask, latents, _dur) = out
        _z, z_p, m_p, logs_p, _mq, logs_q = latents
        mel = batch["spec"] if use_mel_post else melmod.spec_to_mel(
            batch["spec"], a.filter_length, a.n_mel_channels,
            a.sampling_rate, a.mel_fmin, a.mel_fmax,
        )
        y_mel = slice_segments(mel, ids, seg_frames)
        y_hat_mel = melmod.mel_spectrogram(
            y_hat[..., 0].astype(jnp.float32), a.filter_length,
            a.n_mel_channels, a.sampling_rate, a.hop_length, a.win_length,
            a.mel_fmin, a.mel_fmax,
        )
        return {
            "eval/loss_mel": jnp.mean(jnp.abs(y_mel - y_hat_mel)) * c_mel,
            "eval/loss_kl": kl_loss(z_p, logs_q, m_p, logs_p, z_mask) * c_kl,
            "eval/loss_dur": jnp.sum(l_length.astype(jnp.float32)),
        }

    return eval_step
