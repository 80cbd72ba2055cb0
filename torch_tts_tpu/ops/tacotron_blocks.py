"""Tacotron building blocks.

Equivalents of /root/reference/tacotron/modules/modules.py (PreNet, Highway,
CBHG, MelPostnet/MelPostnet2) and modules/activations.py (inverse-square-root
units), channels-last. BatchNorm running stats live in the standard flax
"batch_stats" collection (train steps pass mutable=['batch_stats']).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from torch_tts_tpu.ops.layers import Conv1d, Dense, Dropout


def isru(x, alpha: float = 1.0):
    return x / jnp.sqrt(1.0 + alpha * (x * x))


def isrlu(x, alpha: float = 1.0):
    return jnp.where(x >= 0, x, x / jnp.sqrt(1.0 + alpha * (x * x)))


def isru_sigmoid(x):
    return (1.0 + isru(x / 2.0, 1.0)) / 2.0


class BatchNorm(nn.Module):
    """BatchNorm over (batch, time); torch momentum/eps defaults."""

    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        return nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            use_scale=self.use_scale,
            use_bias=self.use_bias,
            axis_name=None,
        )(x)


class PreNet(nn.Module):
    """FC-ReLU-Dropout x2; dropout can stay active at eval (the original
    Tacotron recipe, modules.py:15-41)."""

    dim_output: int
    dim_hidden: int = 256
    p_dropout: float = 0.5
    always_dropout: bool = False
    activation: Callable = jax.nn.relu

    @nn.compact
    def __call__(self, x, deterministic: bool = True, rng=None):
        # rng: explicit key for the (always-on) masks; per-layer folds keep
        # the two masks independent. See ops/layers.Dropout.
        drop_on = self.always_dropout or not deterministic
        drop = Dropout(self.p_dropout)
        k1 = k2 = None
        if rng is not None and drop_on:
            k1 = jax.random.fold_in(rng, 1)
            k2 = jax.random.fold_in(rng, 2)
        x = drop(self.activation(Dense(self.dim_hidden, name="fc1")(x)),
                 not drop_on, rng=k1)
        x = drop(self.activation(Dense(self.dim_output, name="fc2")(x)),
                 not drop_on, rng=k2)
        return x


class HighwayLayer(nn.Module):
    @nn.compact
    def __call__(self, x):
        t = jax.nn.sigmoid(Dense(x.shape[-1], name="T")(x))
        y = jax.nn.relu(Dense(x.shape[-1], name="H")(x))
        return y * t + x * (1.0 - t)


class CBHG(nn.Module):
    """Conv bank (odd k up to 2K-1) + maxpool + projections + highway + BiGRU
    (modules.py:57-138)."""

    dim_output: int
    dim_conv_hidden: int = 128
    dim_proj_hidden: int = 128
    dim_highway: int = 128
    K: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        from torch_tts_tpu.ops.rnn import GRUCell, reverse_padded

        x_residual = x
        banks = []
        for k in range(1, 1 + self.K, 2):
            y = Conv1d(
                self.dim_conv_hidden, k, padding=k // 2, use_bias=False,
                name=f"bank_{k}",
            )(x)
            y = jax.nn.relu(y)
            y = BatchNorm(name=f"bank_bn_{k}")(y, use_running_average=not train)
            banks.append(y)
        y = jnp.concatenate(banks, axis=-1)
        # max pool k=3 s=1 p=1 along time
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 1), (1, 1, 1), [(0, 0), (1, 1), (0, 0)]
        )
        y = Conv1d(self.dim_proj_hidden, 3, padding=1, use_bias=False, name="proj1")(y)
        y = jax.nn.relu(BatchNorm(name="proj_bn1")(y, use_running_average=not train))
        y = Conv1d(x.shape[-1], 3, padding=1, name="proj2")(y)
        y = y + x_residual

        if y.shape[-1] != self.dim_highway:
            y = Dense(self.dim_highway, use_bias=False, name="highway_in")(y)
        for i in range(4):
            y = HighwayLayer(name=f"highway_{i}")(y)

        # bidirectional GRU
        H = self.dim_output // 2
        fwd = nn.scan(
            GRUCell, variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )(H, name="gru_fwd")
        bwd = nn.scan(
            GRUCell, variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )(H, name="gru_bwd")
        B, T, _ = y.shape
        h0 = jnp.zeros((B, H), y.dtype)
        _, ys_f = fwd(h0, y)
        _, ys_b = bwd(h0, y[:, ::-1])
        return jnp.concatenate([ys_f, ys_b[:, ::-1]], axis=-1)


class MelPostnet(nn.Module):
    """Tacotron-2-style conv postnet with ISRU activations and residual output
    (modules.py:155-184)."""

    dim_mel: int
    dim_hidden: int = 512
    kernel_size: int = 5
    num_layers: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True):
        pad = (self.kernel_size - 1) // 2
        y = x
        drop = Dropout(0.1)
        for i in range(self.num_layers):
            y = Conv1d(
                self.dim_hidden, self.kernel_size, padding=pad, use_bias=False,
                name=f"conv_{i}",
            )(y)
            y = BatchNorm(name=f"bn_{i}")(y, use_running_average=not train)
            y = drop(isru(y), deterministic)
        return x + Dense(self.dim_mel, use_bias=False, name="fc_out")(y)


class MelPostnet2(nn.Module):
    """Stacked residual conv blocks (modules.py:187-216)."""

    dim_in: int
    dim_hidden: int = 128
    num_layers: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True):
        drop = Dropout(0.2)
        for i in range(self.num_layers):
            y = Conv1d(self.dim_hidden, 5, padding=2, use_bias=False,
                       name=f"l{i}_conv1")(x)
            y = BatchNorm(name=f"l{i}_bn1")(y, use_running_average=not train)
            y = drop(nn.leaky_relu(y), deterministic)
            y = Conv1d(self.dim_hidden, 5, padding=2, use_bias=False,
                       name=f"l{i}_conv2")(y)
            y = BatchNorm(name=f"l{i}_bn2")(y, use_running_average=not train)
            y = drop(nn.leaky_relu(y), deterministic)
            y = Conv1d(self.dim_in, 5, padding=2, use_bias=False,
                       name=f"l{i}_conv3")(y)
            x = x + y
        return x


class Taco1PostNet(nn.Module):
    """CBHG postnet mapping mel -> linear STFT (modules.py:141-152)."""

    dim_stft: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = CBHG(256, dim_conv_hidden=64, dim_proj_hidden=128, K=8, name="cbhg")(
            x, train=train
        )
        y = Dense(self.dim_stft, name="fc")(y)
        return y + Dense(self.dim_stft, use_bias=False, name="direct")(x)


class Upsampler(nn.Module):
    """2x time upsampling by interleaving two conv streams (modules.py:219-229)."""

    @nn.compact
    def __call__(self, x):
        y1 = Conv1d(x.shape[-1], 3, padding=1, use_bias=False, name="conv1")(x)
        y2 = Conv1d(x.shape[-1], 3, padding=1, use_bias=False, name="conv2")(x)
        B, T, C = x.shape
        return jnp.stack([y1, y2], axis=2).reshape(B, 2 * T, C)
