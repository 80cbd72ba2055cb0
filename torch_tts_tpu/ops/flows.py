"""Normalizing-flow building blocks.

Equivalents of the flow primitives in /root/reference/vits2/modules.py:363-516
(Log, Flip, ElementwiseAffine, ResidualCouplingLayer, ConvFlow), channels-last.
Each flow's __call__(x, x_mask, g=None, reverse=False) returns (y, logdet) in
the forward direction and y alone in reverse, matching the reference calling
convention so flow stacks compose identically.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from torch_tts_tpu.ops.convs import DDSConv
from torch_tts_tpu.ops.layers import Conv1d
from torch_tts_tpu.ops.splines import piecewise_rational_quadratic_transform
from torch_tts_tpu.ops.wavenet import WN


class Log(nn.Module):
    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False, deterministic: bool = True):
        if not reverse:
            y = jnp.log(jnp.clip(x, min=1e-5)) * x_mask
            logdet = jnp.sum(-y, axis=(1, 2))
            return y, logdet
        return jnp.exp(x) * x_mask


class Flip(nn.Module):
    @nn.compact
    def __call__(self, x, x_mask=None, g=None, reverse: bool = False, deterministic: bool = True):
        y = jnp.flip(x, axis=-1)
        if not reverse:
            return y, jnp.zeros((x.shape[0],), dtype=x.dtype)
        return y


class ElementwiseAffine(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False, deterministic: bool = True):
        m = self.param("m", nn.initializers.zeros, (self.channels,))
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        if not reverse:
            y = (m + jnp.exp(logs) * x) * x_mask
            logdet = jnp.sum(logs * x_mask, axis=(1, 2))
            return y, logdet
        return (x - m) * jnp.exp(-logs) * x_mask


class ResidualCouplingLayer(nn.Module):
    """Affine coupling with a WN conditioner on the first half."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    p_dropout: float = 0.0
    gin_channels: int = 0
    mean_only: bool = False

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False, deterministic: bool = True):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.hidden_channels, 1, name="pre")(x0) * x_mask
        h = WN(
            self.hidden_channels,
            self.kernel_size,
            self.dilation_rate,
            self.n_layers,
            p_dropout=self.p_dropout,
            gin_channels=self.gin_channels,
            name="enc",
        )(h, x_mask, g=g, deterministic=deterministic)
        stats = Conv1d(half * (2 - self.mean_only), 1, zero_init=True, name="post")(
            h
        ) * x_mask
        if not self.mean_only:
            m, logs = stats[..., :half], stats[..., half:]
        else:
            m = stats
            logs = jnp.zeros_like(m)

        if not reverse:
            x1 = (m + x1 * jnp.exp(logs)) * x_mask
            logdet = jnp.sum(logs, axis=(1, 2))
            return jnp.concatenate([x0, x1], axis=-1), logdet
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class ConvFlow(nn.Module):
    """Rational-quadratic spline coupling conditioned through DDSConv."""

    in_channels: int
    filter_channels: int
    kernel_size: int
    n_layers: int
    num_bins: int = 10
    tail_bound: float = 5.0

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False, deterministic: bool = True):
        half = self.in_channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.filter_channels, 1, name="pre")(x0)
        h = DDSConv(
            self.filter_channels, self.kernel_size, self.n_layers, p_dropout=0.0,
            name="convs",
        )(h, x_mask, g=g, deterministic=deterministic)
        h = Conv1d(half * (self.num_bins * 3 - 1), 1, zero_init=True, name="proj")(
            h
        ) * x_mask

        b, t, _ = x0.shape
        # [B, T, half*(3K-1)] -> [B, T, half, 3K-1]
        h = h.reshape(b, t, half, self.num_bins * 3 - 1)
        scale = math.sqrt(self.filter_channels)
        uw = h[..., : self.num_bins] / scale
        uh = h[..., self.num_bins : 2 * self.num_bins] / scale
        ud = h[..., 2 * self.num_bins :]

        x1, logabsdet = piecewise_rational_quadratic_transform(
            x1, uw, uh, ud, inverse=reverse, tails="linear", tail_bound=self.tail_bound
        )
        y = jnp.concatenate([x0, x1], axis=-1) * x_mask
        if not reverse:
            logdet = jnp.sum(logabsdet * x_mask, axis=(1, 2))
            return y, logdet
        return y
