"""Conv blocks: ConvReluNorm and dilated depth-separable convs (DDSConv).

Equivalents of /root/reference/vits2/modules.py:32-130, channels-last.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from torch_tts_tpu.ops.layers import Conv1d, Dropout, LayerNorm


class ConvReluNorm(nn.Module):
    hidden_channels: int
    out_channels: int
    kernel_size: int
    n_layers: int
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        x_org = x
        drop = Dropout(self.p_dropout)
        for i in range(self.n_layers):
            x = Conv1d(
                self.hidden_channels,
                self.kernel_size,
                padding=self.kernel_size // 2,
                name=f"conv_{i}",
            )(x * x_mask)
            x = LayerNorm(name=f"norm_{i}")(x)
            x = drop(jax.nn.relu(x), deterministic)
        x = x_org + Conv1d(self.out_channels, 1, zero_init=True, name="proj")(x)
        return x * x_mask


class DDSConv(nn.Module):
    """Dilated depth-separable conv stack with per-layer LayerNorm + GELU."""

    channels: int
    kernel_size: int
    n_layers: int
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, g: Optional[jnp.ndarray] = None, deterministic: bool = True):
        if g is not None:
            x = x + g
        drop = Dropout(self.p_dropout)
        for i in range(self.n_layers):
            dilation = self.kernel_size**i
            padding = (self.kernel_size * dilation - dilation) // 2
            y = Conv1d(
                self.channels,
                self.kernel_size,
                padding=padding,
                dilation=dilation,
                groups=self.channels,
                name=f"sep_{i}",
            )(x * x_mask)
            y = LayerNorm(name=f"norm1_{i}")(y)
            y = jax.nn.gelu(y, approximate=False)
            y = Conv1d(self.channels, 1, name=f"pw_{i}")(y)
            y = LayerNorm(name=f"norm2_{i}")(y)
            y = jax.nn.gelu(y, approximate=False)
            y = drop(y, deterministic)
            x = x + y
        return x * x_mask
