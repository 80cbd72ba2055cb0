"""Tacotron training losses (equivalents of /root/reference/tacotron/tacotron.py:59-138)."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def mel_loss_fn(y, x, mask=None, order: int = 1):
    """Masked mel reconstruction loss; order 0 = volume-weighted asymmetric L1,
    1 = L1, 2 = RMSE (tacotron.py:59-85)."""
    if order == 0:
        vol = jnp.clip(jax.lax.stop_gradient(x).mean(axis=2, keepdims=True), 0.1)
        diff = y - x
        loss = jnp.where(diff > 0, vol * diff, -diff)
    elif order == 1:
        loss = jnp.abs(x - y)
    else:
        loss = jnp.square(x - y)

    if mask is None:
        loss = jnp.mean(loss)
    else:
        loss = jnp.mean(loss * mask, axis=2)
        loss = jnp.sum(loss) / jnp.maximum(jnp.sum(mask), 1.0)

    if order in (0, 1):
        return loss
    return jnp.sqrt(loss)


def alignment_max_loss(w):
    """Encourage crisp attention: penalize weak per-frame maxima (tacotron.py:87)."""
    return jnp.mean(1.0 - jnp.max(w, axis=2))


def alignment_std_loss(w):
    """Attention spread regularizer (tacotron.py:92-97)."""
    D = w.shape[2]
    t = jnp.arange(D, dtype=w.dtype)[None, None, :]
    w_var = jnp.sum(w * t**2, axis=2) - jnp.sum(w * t, axis=2) ** 2
    return jnp.sqrt(jnp.mean(jnp.clip(w_var, 0.0)))


def stop_bce_loss(s_logits, target_mask, pos_weight: float = 0.1):
    """BCE-with-logits on the stop channel; target is the in-sequence mask,
    positive class down-weighted (tacotron.py:119-122)."""
    y = target_mask.astype(jnp.float32)
    x = s_logits.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(x)
    log_q = jax.nn.log_sigmoid(-x)
    return -jnp.mean(pos_weight * y * log_p + (1.0 - y) * log_q)


def tacotron_loss(
    y, y_post, s, x, xmask, w, kl_loss
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Composite loss mix 0.8*mel + 0.2*mel_post + 0.1*stop + 2e-4*kl + 1e-4*w
    with the temporal-difference terms (tacotron.py:100-138)."""
    T = y.shape[1]
    x = x[:, :T]
    xmask = xmask[:, :T]
    m = xmask[..., None].astype(y.dtype)

    loss_mel = mel_loss_fn(y, x, m, 1) + mel_loss_fn(
        jnp.diff(y, axis=1), jnp.diff(x, axis=1), order=1
    )
    loss_mel_post = mel_loss_fn(y_post, x, m, 1) + mel_loss_fn(
        jnp.diff(y_post, axis=1), jnp.diff(x, axis=1), order=1
    )
    loss_stop = stop_bce_loss(s[..., 0], xmask)
    loss_w = alignment_std_loss(w)

    loss = 0.8 * loss_mel + 0.2 * loss_mel_post + 0.1 * loss_stop
    loss = loss + 2e-4 * kl_loss + 1e-4 * loss_w
    metrics = {
        "loss": loss,
        "loss_mel_db": 100.0 * loss_mel,
        "loss_mel_post_db": 100.0 * loss_mel_post,
        "loss_stop": loss_stop,
        "loss_kl": kl_loss,
        "loss_w": loss_w,
    }
    return loss, metrics
