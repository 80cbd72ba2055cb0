"""Standalone autoencoder / VAE bottleneck utilities.

Equivalents of /root/reference/tacotron/modules/autoencoder.py:5-33 — small
dense autoencoders usable as feature bottlenecks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from torch_tts_tpu.ops.layers import Dense


class Autoencoder(nn.Module):
    dim_bottleneck: int

    @nn.compact
    def __call__(self, x):
        z = jnp.tanh(Dense(self.dim_bottleneck, name="enc")(x))
        return Dense(x.shape[-1], name="dec")(z), z


class VAEBottleneck(nn.Module):
    dim_bottleneck: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = jnp.tanh(Dense(2 * self.dim_bottleneck, name="enc")(x))
        mean = Dense(self.dim_bottleneck, name="mean")(h)
        logvar = Dense(self.dim_bottleneck, name="logvar")(h)
        if deterministic:
            z = mean
        else:
            eps = jax.random.normal(self.make_rng("noise"), mean.shape, mean.dtype)
            z = mean + eps * jnp.exp(0.5 * logvar)
        kl = -0.5 * (1 + logvar - mean**2 - jnp.exp(logvar))
        out = Dense(x.shape[-1], name="dec")(z)
        return out, {"z": z, "kl": kl}
