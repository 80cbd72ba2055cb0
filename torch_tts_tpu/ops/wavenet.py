"""WaveNet-style gated dilated conv stack (WN).

Equivalent of /root/reference/vits2/modules.py:133-218 in channels-last
layout: n_layers of [dilated conv -> gated tanh/sigmoid (+ speaker
conditioning) -> 1x1 res/skip], with weight norm on every conv.

Two execution paths, same parameters, same values:
- XLA (default off-TPU / fallback): one conv + one matmul per layer; the
  per-layer gating is a single fused elementwise op that XLA folds into the
  conv epilogue.
- fused=True: the whole stack runs through kernels/wn_stack.py — a Pallas
  kernel that keeps activations VMEM-resident across groups of layers
  (measured well above the FLOP floor as separate XLA ops at the production
  shapes; see BASELINE.md). Requires dilation_rate == 1 and inactive
  dropout; anything else silently uses the XLA path.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from torch_tts_tpu.ops.layers import (
    Conv1d,
    Dropout,
    fused_add_tanh_sigmoid_multiply,
)


def fused_wn_default() -> bool:
    """Process-wide default for WN.fused (env TTS_FUSED_WN=1/0).

    Trace-time static: flipping it after a jit compile requires a new trace,
    like any other architecture flag. Per-module `fused=True/False` wins."""
    return os.environ.get("TTS_FUSED_WN", "0") == "1"


class WN(nn.Module):
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0
    # whole-stack Pallas kernel (kernels/wn_stack.py); None = fused_wn_default()
    fused: Optional[bool] = None

    @nn.compact
    def __call__(self, x, x_mask, g: Optional[jnp.ndarray] = None, deterministic: bool = True):
        """x: [B, T, H]; x_mask: [B, T, 1]; g: [B, 1, gin] or [B, T, gin]."""
        h = self.hidden_channels
        if g is not None:
            # one 1x1 conv produces all layers' conditioning at once
            g_all = Conv1d(
                2 * h * self.n_layers, 1, weight_norm=True, name="cond_layer"
            )(g)

        if self.fused is not None:
            fused = self.fused
        else:
            # Env default is shape-aware: the kernel is only a measured win
            # for single-group stacks (n_layers <= wn_stack's group of 4 —
            # chained groups pay inter-group HBM round-trips) at batch >= 2
            # (B=1 infer: 2.66 vs 2.25 ms XLA). flow-shaped L=4/B=8 train
            # grad: 2.96 vs 4.85 ms (scripts/bench_wn.py). Explicit
            # fused=True forces the kernel regardless.
            fused = (
                fused_wn_default()
                and self.n_layers <= 4
                and x.shape[0] >= 2
            )
        use_fused = (
            fused
            and self.dilation_rate == 1
            and self.kernel_size % 2 == 1
            and (self.p_dropout == 0.0 or deterministic)
            and (g is None or g.shape[1] == 1)  # time-broadcast conditioning
        )
        if use_fused:
            return self._fused(x, x_mask, g_all if g is not None else None)

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

    def _fused(self, x, x_mask, g_all):
        """Collect effective weights from the SAME Conv1d submodules (param
        tree identical to the XLA path) and run the whole stack through the
        fused kernel."""
        from torch_tts_tpu.kernels.wn_stack import wn_stack

        h = self.hidden_channels
        L, k = self.n_layers, self.kernel_size
        pad_same = (k - 1) // 2
        w_in, b_in, w_rs, b_rs = [], [], [], []
        for i in range(L):
            wi, bi = Conv1d(
                2 * h, k, padding=pad_same, dilation=1, weight_norm=True,
                name=f"in_{i}",
            )(x, return_kernel=True)
            w_in.append(wi)
            b_in.append(bi)
            res_skip_ch = 2 * h if i < L - 1 else h
            wr, br = Conv1d(
                res_skip_ch, 1, weight_norm=True, name=f"res_skip_{i}"
            )(jnp.zeros((1, 1, h), x.dtype), return_kernel=True)
            wr, br = wr[0], br  # [h, res_skip_ch]
            if i == L - 1:
                # final layer is all-skip: zero-pad the residual half so the
                # generic layer update becomes x += 0 (reference leaves x
                # untouched on the last layer)
                wr = jnp.concatenate(
                    [jnp.zeros((h, h), wr.dtype), wr], axis=-1
                )
                br = jnp.concatenate([jnp.zeros((h,), br.dtype), br])
            w_rs.append(wr)
            b_rs.append(br)
        w_in = jnp.stack(w_in)            # [L, k, H, 2H]
        b_in = jnp.stack(b_in)            # [L, 2H]
        w_rs = jnp.stack(w_rs)            # [L, H, 2H]
        b_rs = jnp.stack(b_rs)            # [L, 2H]
        gl = None
        if g_all is not None:
            gl = g_all[:, 0].reshape(g_all.shape[0], L, 2 * h)
        return wn_stack(x, x_mask, gl, w_in, b_in, w_rs, b_rs)
