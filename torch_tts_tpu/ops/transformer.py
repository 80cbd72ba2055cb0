"""Relative-position transformer blocks (VITS text encoder / flow transformers).

Equivalents of /root/reference/vits2/attentions.py in channels-last layout:
- MultiHeadAttention with windowed relative-position embeddings (window_size,
  heads_share) using the Music-Transformer pad/reshape skew trick
  (attentions.py:333-368) expressed as jnp pad+reshape (XLA lowers these to
  free layout ops),
- FFN with same/causal conv padding and the reference's sigmoid-GELU variant,
- Encoder with mid-stack speaker-conditioning injection (cond_layer_idx),
- causal Decoder and the FFT block used by the `fft` transformer flow.

torch's `proximal_init` (copying q weights into k at init,
attentions.py:231-234): the q==k copy semantics are exact — when enabled,
conv_q and conv_k draw their init values from one shared PRNG key, so they
start identical. The underlying init *distribution* still differs for fresh
training: this code draws torch-default-uniform while the reference
xavier_uniform-initializes conv_q/k/v (attentions.py:227-229). Checkpoint
loading is unaffected either way (the converter overwrites all params).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from torch_tts_tpu.ops.layers import (
    Conv1d,
    Dropout,
    LayerNorm,
    fused_add_tanh_sigmoid_multiply,
    torch_uniform_init,
)


def _rel_to_abs(x: jax.Array) -> jax.Array:
    """[B, H, L, 2L-1] relative logits -> [B, H, L, L] absolute."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x_flat = x.reshape(b, h, l * 2 * l)
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (0, l - 1)))
    x_final = x_flat.reshape(b, h, l + 1, 2 * l - 1)
    return x_final[:, :, :l, l - 1 :]


def _abs_to_rel(x: jax.Array) -> jax.Array:
    """[B, H, L, L] absolute weights -> [B, H, L, 2L-1] relative."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, l - 1)))
    x_flat = x.reshape(b, h, l * l + l * (l - 1))
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (l, 0)))
    return x_flat.reshape(b, h, l, 2 * l)[..., 1:]


class MultiHeadAttention(nn.Module):
    channels: int
    out_channels: int
    n_heads: int
    p_dropout: float = 0.0
    window_size: Optional[int] = None
    heads_share: bool = True
    block_length: Optional[int] = None
    proximal_bias: bool = False
    proximal_init: bool = False

    @nn.compact
    def __call__(self, x, c, attn_mask=None, deterministic: bool = True):
        """x: query source [B, Tt, C]; c: key/value source [B, Ts, C];
        attn_mask: [B or 1, 1 or H, Tt, Ts] (1 = attend)."""
        d_k = self.channels // self.n_heads
        qk_kwargs = {}
        if self.proximal_init and self.is_initializing():
            # attentions.py:231-234: conv_k starts as a copy of conv_q. Both
            # convs draw kernel+bias from ONE shared key (still a valid
            # torch-uniform draw — only q == k matters).
            shared = self.make_rng("params")
            k_kern, k_bias = jax.random.split(shared)
            base_k = torch_uniform_init(x.shape[-1])
            base_b = torch_uniform_init(x.shape[-1])
            qk_kwargs = dict(
                kernel_init=lambda _rng, s, d=jnp.float32: base_k(k_kern, s, d),
                bias_init=lambda _rng, s, d=jnp.float32: base_b(k_bias, s, d),
            )
        q = Conv1d(self.channels, 1, name="conv_q", **qk_kwargs)(x)
        k = Conv1d(self.channels, 1, name="conv_k", **qk_kwargs)(c)
        v = Conv1d(self.channels, 1, name="conv_v")(c)

        b, t_t, _ = q.shape
        t_s = k.shape[1]
        # [B, T, C] -> [B, H, T, D]
        qh = q.reshape(b, t_t, self.n_heads, d_k).transpose(0, 2, 1, 3)
        kh = k.reshape(b, t_s, self.n_heads, d_k).transpose(0, 2, 1, 3)
        vh = v.reshape(b, t_s, self.n_heads, d_k).transpose(0, 2, 1, 3)

        scores = jnp.einsum(
            "bhtd,bhsd->bhts", qh / math.sqrt(d_k), kh,
            preferred_element_type=jnp.float32,
        )

        if self.window_size is not None:
            assert t_s == t_t, "relative attention requires self-attention"
            n_heads_rel = 1 if self.heads_share else self.n_heads
            rel_stddev = d_k**-0.5
            emb_rel_k = self.param(
                "emb_rel_k",
                nn.initializers.normal(rel_stddev),
                (n_heads_rel, 2 * self.window_size + 1, d_k),
            )
            emb_rel_v = self.param(
                "emb_rel_v",
                nn.initializers.normal(rel_stddev),
                (n_heads_rel, 2 * self.window_size + 1, d_k),
            )
            rel_k = self._relative_embeddings(emb_rel_k, t_s)
            rel_logits = jnp.einsum(
                "bhtd,gmd->bhtm", qh / math.sqrt(d_k), rel_k,
                preferred_element_type=jnp.float32,
            )
            scores = scores + _rel_to_abs(rel_logits)

        if self.proximal_bias:
            assert t_s == t_t, "proximal bias requires self-attention"
            r = jnp.arange(t_s, dtype=jnp.float32)
            diff = r[None, :] - r[:, None]
            scores = scores + (-jnp.log1p(jnp.abs(diff)))[None, None]

        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e4, scores)
            if self.block_length is not None:
                assert t_s == t_t, "local attention requires self-attention"
                r = jnp.arange(t_s)
                local = jnp.abs(r[None, :] - r[:, None]) <= self.block_length
                scores = jnp.where(local[None, None], scores, -1e4)

        p_attn = jax.nn.softmax(scores, axis=-1)
        p_attn = Dropout(self.p_dropout)(p_attn, deterministic)
        out = jnp.einsum("bhts,bhsd->bhtd", p_attn, vh)
        if self.window_size is not None:
            rel_w = _abs_to_rel(p_attn)
            rel_v = self._relative_embeddings(emb_rel_v, t_s)
            out = out + jnp.einsum("bhtm,gmd->bhtd", rel_w, rel_v)

        out = out.transpose(0, 2, 1, 3).reshape(b, t_t, self.channels)
        return Conv1d(self.out_channels, 1, name="conv_o")(out)

    def _relative_embeddings(self, emb: jax.Array, length: int) -> jax.Array:
        """Slice/pad [h', 2w+1, d] window embeddings to [h', 2*length-1, d]."""
        w = self.window_size
        pad_len = max(length - (w + 1), 0)
        start = max((w + 1) - length, 0)
        if pad_len > 0:
            emb = jnp.pad(emb, ((0, 0), (pad_len, pad_len), (0, 0)))
        return emb[:, start : start + 2 * length - 1]


class FFN(nn.Module):
    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0
    activation: Optional[str] = None
    causal: bool = False

    def _pad(self, x):
        if self.kernel_size == 1:
            return x
        if self.causal:
            lo, hi = self.kernel_size - 1, 0
        else:
            lo, hi = (self.kernel_size - 1) // 2, self.kernel_size // 2
        return jnp.pad(x, ((0, 0), (lo, hi), (0, 0)))

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        y = Conv1d(self.filter_channels, self.kernel_size, name="conv_1")(
            self._pad(x * x_mask)
        )
        if self.activation == "gelu":
            y = y * jax.nn.sigmoid(1.702 * y)
        else:
            y = jax.nn.relu(y)
        y = Dropout(self.p_dropout)(y, deterministic)
        y = Conv1d(self.out_channels, self.kernel_size, name="conv_2")(
            self._pad(y * x_mask)
        )
        return y * x_mask


class Encoder(nn.Module):
    """Self-attention encoder stack; post-LN residual blocks.

    gin_channels > 0 adds the projected speaker embedding into the hidden
    stream before layer `cond_layer_idx` (VITS2 speaker-conditioned text
    encoder, attentions.py:40-52,76-93).
    """

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    window_size: int = 4
    gin_channels: int = 0
    cond_layer_idx: int = 2

    @nn.compact
    def __call__(self, x, x_mask, g=None, deterministic: bool = True):
        attn_mask = x_mask[:, None, :, 0][:, :, None, :] * x_mask[:, None, :, 0][:, :, :, None]
        x = x * x_mask
        drop = Dropout(self.p_dropout)
        cond_idx = self.cond_layer_idx if self.gin_channels > 0 else self.n_layers
        for i in range(self.n_layers):
            if i == cond_idx and g is not None:
                g_proj = nn.Dense(self.hidden_channels, name="spk_emb_linear")(g)
                x = (x + g_proj) * x_mask
            y = MultiHeadAttention(
                self.hidden_channels,
                self.hidden_channels,
                self.n_heads,
                p_dropout=self.p_dropout,
                window_size=self.window_size,
                name=f"attn_{i}",
            )(x, x, attn_mask, deterministic)
            y = drop(y, deterministic)
            x = LayerNorm(name=f"norm1_{i}")(x + y)
            y = FFN(
                self.hidden_channels,
                self.filter_channels,
                self.kernel_size,
                p_dropout=self.p_dropout,
                name=f"ffn_{i}",
            )(x, x_mask, deterministic)
            y = drop(y, deterministic)
            x = LayerNorm(name=f"norm2_{i}")(x + y)
        return x * x_mask


class Decoder(nn.Module):
    """Causal self-attn + cross-attn decoder (attentions.py:96-179)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    proximal_bias: bool = False
    proximal_init: bool = True  # reference Decoder default (attentions.py:106)

    @nn.compact
    def __call__(self, x, x_mask, h, h_mask, deterministic: bool = True):
        t = x.shape[1]
        causal = jnp.tril(jnp.ones((t, t)))[None, None]
        encdec_mask = h_mask[:, None, :, 0][:, :, None, :] * x_mask[:, None, :, 0][:, :, :, None]
        x = x * x_mask
        drop = Dropout(self.p_dropout)
        for i in range(self.n_layers):
            y = MultiHeadAttention(
                self.hidden_channels,
                self.hidden_channels,
                self.n_heads,
                p_dropout=self.p_dropout,
                proximal_bias=self.proximal_bias,
                proximal_init=self.proximal_init,
                name=f"self_attn_{i}",
            )(x, x, causal, deterministic)
            x = LayerNorm(name=f"norm0_{i}")(x + drop(y, deterministic))
            y = MultiHeadAttention(
                self.hidden_channels,
                self.hidden_channels,
                self.n_heads,
                p_dropout=self.p_dropout,
                name=f"encdec_attn_{i}",
            )(x, h, encdec_mask, deterministic)
            x = LayerNorm(name=f"norm1_{i}")(x + drop(y, deterministic))
            y = FFN(
                self.hidden_channels,
                self.filter_channels,
                self.kernel_size,
                p_dropout=self.p_dropout,
                causal=True,
                name=f"ffn_{i}",
            )(x, x_mask, deterministic)
            x = LayerNorm(name=f"norm2_{i}")(x + drop(y, deterministic))
        return x * x_mask


class FFT(nn.Module):
    """Causal self-attention block with optional WN-style gin gating
    (attentions.py:559-646), used by the `fft` transformer flow."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int = 1
    kernel_size: int = 1
    p_dropout: float = 0.0
    proximal_bias: bool = False
    proximal_init: bool = True  # reference FFT default (attentions.py:569)
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask, g=None, deterministic: bool = True):
        if g is not None and self.gin_channels > 0:
            g_all = Conv1d(
                2 * self.hidden_channels * self.n_layers, 1, weight_norm=True,
                name="cond_layer",
            )(g)
        t = x.shape[1]
        causal = jnp.tril(jnp.ones((t, t)))[None, None]
        x = x * x_mask
        drop = Dropout(self.p_dropout)
        # one cond_pre shared across layers, like the reference's single
        # module (attentions.py:577-579) — declaring it inside the loop would
        # collide scope names when n_layers > 1
        cond_pre = Conv1d(2 * self.hidden_channels, 1, name="cond_pre")
        for i in range(self.n_layers):
            if g is not None and self.gin_channels > 0:
                xc = cond_pre(x)
                g_l = g_all[..., i * 2 * self.hidden_channels : (i + 1) * 2 * self.hidden_channels]
                x = fused_add_tanh_sigmoid_multiply(xc, g_l, self.hidden_channels)
            y = MultiHeadAttention(
                self.hidden_channels,
                self.hidden_channels,
                self.n_heads,
                p_dropout=self.p_dropout,
                proximal_bias=self.proximal_bias,
                proximal_init=self.proximal_init,
                name=f"self_attn_{i}",
            )(x, x, causal, deterministic)
            x = LayerNorm(name=f"norm0_{i}")(x + drop(y, deterministic))
            y = FFN(
                self.hidden_channels,
                self.filter_channels,
                self.kernel_size,
                p_dropout=self.p_dropout,
                causal=True,
                name=f"ffn_{i}",
            )(x, x_mask, deterministic)
            x = LayerNorm(name=f"norm1_{i}")(x + drop(y, deterministic))
        return x * x_mask
