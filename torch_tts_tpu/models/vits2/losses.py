"""VITS2 training losses (equivalents of /root/reference/vits2/losses.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def feature_loss(fmap_r, fmap_g):
    """L1 feature-matching loss over discriminator activations, doubled
    (losses.py:7-13)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            rl = jax.lax.stop_gradient(rl).astype(jnp.float32)
            loss += jnp.mean(jnp.abs(rl - gl.astype(jnp.float32)))
    return loss * 2.0


def discriminator_loss(disc_real_outputs, disc_generated_outputs):
    """LSGAN D loss (losses.py:16-25). Returns (total, per-disc r, per-disc g)."""
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        dr = dr.astype(jnp.float32)
        dg = dg.astype(jnp.float32)
        r_losses.append(jnp.mean((1.0 - dr) ** 2))
        g_losses.append(jnp.mean(dg**2))
    r = jnp.stack(r_losses)
    g = jnp.stack(g_losses)
    return jnp.sum(r) + jnp.sum(g), r, g


def generator_loss(disc_outputs):
    """LSGAN G loss (losses.py:28-34). Returns (total, per-disc)."""
    losses = [jnp.mean((1.0 - dg.astype(jnp.float32)) ** 2) for dg in disc_outputs]
    per = jnp.stack(losses)
    return jnp.sum(per), per


def kl_loss(z_p, logs_q, m_p, logs_p, z_mask):
    """Masked gaussian KL between posterior samples and the expanded prior
    (losses.py:37-46). All inputs channels-last [B, T, D]; z_mask [B, T, 1]."""
    z_p = z_p.astype(jnp.float32)
    logs_q = logs_q.astype(jnp.float32)
    m_p = m_p.astype(jnp.float32)
    logs_p = logs_p.astype(jnp.float32)
    kl = logs_p - logs_q - 0.5
    kl += 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    return jnp.sum(kl * z_mask) / jnp.sum(z_mask)
