"""GAN discriminators for VITS2 training.

Equivalents of /root/reference/vits2/models.py:977-1110 (DiscriminatorS +
5 period discriminators = MultiPeriodDiscriminator) and the VITS2 duration
discriminators (:183-329). Channels-last layout: waveforms are [B, L, 1],
period discriminators reshape to [B, L/p, p, C] images.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from torch_tts_tpu.ops.layers import Conv1d, Conv2d, Dense, LayerNorm, leaky_relu


def _get_padding(k: int, d: int = 1) -> int:
    return (k * d - d) // 2


class DiscriminatorP(nn.Module):
    period: int
    kernel_size: int = 5
    stride: int = 3
    use_spectral_norm: bool = False

    @nn.compact
    def __call__(self, x):
        """x: [B, L, 1] -> (logits [B, N], feature maps)."""
        wn = not self.use_spectral_norm
        sn = self.use_spectral_norm
        fmap = []
        b, t, c = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            t = t + n_pad
        # [B, L, C] -> [B, L/p, p, C]
        x = x.reshape(b, t // self.period, self.period, c)

        channels = (32, 128, 512, 1024)
        for i, ch in enumerate(channels):
            x = Conv2d(
                ch,
                (self.kernel_size, 1),
                stride=(self.stride, 1),
                padding=(_get_padding(self.kernel_size), 0),
                weight_norm=wn,
                spectral_norm=sn,
                name=f"conv_{i}",
            )(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = Conv2d(
            1024,
            (self.kernel_size, 1),
            stride=(1, 1),
            padding=(_get_padding(self.kernel_size), 0),
            weight_norm=wn,
            spectral_norm=sn,
            name="conv_4",
        )(x)
        x = leaky_relu(x)
        fmap.append(x)
        x = Conv2d(1, (3, 1), padding=(1, 0), weight_norm=wn, spectral_norm=sn,
                   name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class DiscriminatorS(nn.Module):
    use_spectral_norm: bool = False

    @nn.compact
    def __call__(self, x):
        wn = not self.use_spectral_norm
        sn = self.use_spectral_norm
        fmap = []
        specs = [
            (16, 15, 1, 7, 1),
            (64, 41, 4, 20, 4),
            (256, 41, 4, 20, 16),
            (1024, 41, 4, 20, 64),
            (1024, 41, 4, 20, 256),
            (1024, 5, 1, 2, 1),
        ]
        for i, (ch, k, s, p, g) in enumerate(specs):
            x = Conv1d(ch, k, stride=s, padding=p, groups=g, weight_norm=wn,
                       spectral_norm=sn, name=f"conv_{i}")(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = Conv1d(1, 3, padding=1, weight_norm=wn, spectral_norm=sn,
                   name="conv_post")(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    use_spectral_norm: bool = False
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y, y_hat):
        """Runs every sub-discriminator on real and generated audio.

        Returns (y_d_rs, y_d_gs, fmap_rs, fmap_gs) like the reference."""
        discs = [DiscriminatorS(self.use_spectral_norm, name="disc_s")] + [
            DiscriminatorP(p, use_spectral_norm=self.use_spectral_norm, name=f"disc_p{p}")
            for p in self.periods
        ]
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for d in discs:
            out_r, fmap_r = d(y)
            out_g, fmap_g = d(y_hat)
            y_d_rs.append(out_r)
            y_d_gs.append(out_g)
            fmap_rs.append(fmap_r)
            fmap_gs.append(fmap_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class DurationDiscriminatorV1(nn.Module):
    """VITS2 duration discriminator v1 (models.py:183-257; the norm/relu layers
    the reference comments out are likewise omitted)."""

    filter_channels: int
    kernel_size: int = 3
    p_dropout: float = 0.1
    gin_channels: int = 0

    def setup(self):
        k, f = self.kernel_size, self.filter_channels
        self.conv_1 = Conv1d(f, k, padding=k // 2)
        self.conv_2 = Conv1d(f, k, padding=k // 2)
        self.dur_proj = Conv1d(f, 1)
        self.pre_out_conv_1 = Conv1d(f, k, padding=k // 2)
        self.pre_out_conv_2 = Conv1d(f, k, padding=k // 2)
        self.output_layer = Dense(1)

    def _prob(self, x, x_mask, dur):
        dur = self.dur_proj(dur)
        y = jnp.concatenate([x, dur], axis=-1)
        y = self.pre_out_conv_1(y * x_mask)
        y = self.pre_out_conv_2(y * x_mask)
        y = y * x_mask
        return jax.nn.sigmoid(self.output_layer(y))

    def __call__(self, x, x_mask, dur_r, dur_hat):
        x = jax.lax.stop_gradient(x)
        x = self.conv_1(x * x_mask)
        x = self.conv_2(x * x_mask)
        return [self._prob(x, x_mask, d) for d in (dur_r, dur_hat)]


class DurationDiscriminatorV2(nn.Module):
    """VITS2 duration discriminator v2 (models.py:260-329, with LayerNorm+relu)."""

    filter_channels: int
    kernel_size: int = 3
    p_dropout: float = 0.1
    gin_channels: int = 0

    def setup(self):
        k, f = self.kernel_size, self.filter_channels
        self.conv_1 = Conv1d(f, k, padding=k // 2)
        self.norm_1 = LayerNorm()
        self.conv_2 = Conv1d(f, k, padding=k // 2)
        self.norm_2 = LayerNorm()
        self.dur_proj = Conv1d(f, 1)
        self.pre_out_conv_1 = Conv1d(f, k, padding=k // 2)
        self.pre_out_norm_1 = LayerNorm()
        self.pre_out_conv_2 = Conv1d(f, k, padding=k // 2)
        self.pre_out_norm_2 = LayerNorm()
        self.output_layer = Dense(1)

    def _prob(self, x, x_mask, dur):
        dur = self.dur_proj(dur)
        y = jnp.concatenate([x, dur], axis=-1)
        y = self.pre_out_norm_1(jax.nn.relu(self.pre_out_conv_1(y * x_mask)))
        y = self.pre_out_norm_2(jax.nn.relu(self.pre_out_conv_2(y * x_mask)))
        y = y * x_mask
        return jax.nn.sigmoid(self.output_layer(y))

    def __call__(self, x, x_mask, dur_r, dur_hat):
        x = jax.lax.stop_gradient(x)
        x = self.norm_1(jax.nn.relu(self.conv_1(x * x_mask)))
        x = self.norm_2(jax.nn.relu(self.conv_2(x * x_mask)))
        return [self._prob(x, x_mask, d) for d in (dur_r, dur_hat)]
