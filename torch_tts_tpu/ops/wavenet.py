"""WaveNet-style gated dilated conv stack (WN).

Equivalent of /root/reference/vits2/modules.py:133-218 in channels-last
layout: n_layers of [dilated conv -> gated tanh/sigmoid (+ speaker
conditioning) -> 1x1 res/skip], with weight norm on every conv. The per-layer
gating is a single fused elementwise op that XLA folds into the conv epilogue.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from torch_tts_tpu.ops.layers import (
    Conv1d,
    Dropout,
    fused_add_tanh_sigmoid_multiply,
)


class WN(nn.Module):
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, g: Optional[jnp.ndarray] = None, deterministic: bool = True):
        """x: [B, T, H]; x_mask: [B, T, 1]; g: [B, 1, gin] or [B, T, gin]."""
        h = self.hidden_channels
        if g is not None:
            # one 1x1 conv produces all layers' conditioning at once
            g_all = Conv1d(
                2 * h * self.n_layers, 1, weight_norm=True, name="cond_layer"
            )(g)

        output = jnp.zeros_like(x)
        drop = Dropout(self.p_dropout)
        for i in range(self.n_layers):
            dilation = self.dilation_rate**i
            padding = (self.kernel_size * dilation - dilation) // 2
            x_in = Conv1d(
                2 * h,
                self.kernel_size,
                padding=padding,
                dilation=dilation,
                weight_norm=True,
                name=f"in_{i}",
            )(x)
            if g is not None:
                g_l = g_all[..., i * 2 * h : (i + 1) * 2 * h]
            else:
                g_l = jnp.zeros_like(x_in)
            acts = fused_add_tanh_sigmoid_multiply(x_in, g_l, h)
            acts = drop(acts, deterministic)

            res_skip_ch = 2 * h if i < self.n_layers - 1 else h
            res_skip = Conv1d(res_skip_ch, 1, weight_norm=True, name=f"res_skip_{i}")(
                acts
            )
            if i < self.n_layers - 1:
                x = (x + res_skip[..., :h]) * x_mask
                output = output + res_skip[..., h:]
            else:
                output = output + res_skip
        return output * x_mask
