"""Reference/style encoders: GST, VAE (tacotron prosody conditioning).

Equivalents of /root/reference/tacotron/modules/style.py: a strided Conv2d
stack over the mel spectrogram feeding an LSTM (ReferenceEncoder), a
style-token attention layer (STL), and GST / VAE / GST_VAE composites.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from torch_tts_tpu.ops.layers import Conv2d, Dense
from torch_tts_tpu.ops.rnn import UnidirLSTM
from torch_tts_tpu.ops.tacotron_blocks import BatchNorm
from torch_tts_tpu.ops.tacotron_attention import GSTMultiHeadAttention


class ReferenceEncoder(nn.Module):
    """6x Conv2d(3x3, stride 2) + BN + relu over [B, T, n_mels], then LSTM;
    the final hidden state is the reference embedding (style.py:7-76)."""

    dim_out: int = 128
    ref_enc_filters: Tuple[int, ...] = (32, 32, 64, 64, 128, 128)

    @nn.compact
    def __call__(self, mels, input_lengths=None, train: bool = False):
        x = mels[..., None]  # [B, T, M, 1]
        for i, ch in enumerate(self.ref_enc_filters):
            x = Conv2d(ch, (3, 3), stride=(2, 2), padding=(1, 1), name=f"conv_{i}")(x)
            x = BatchNorm(name=f"bn_{i}")(x, use_running_average=not train)
            x = jax.nn.relu(x)
        B, T, M, C = x.shape
        x = x.reshape(B, T, M * C)
        h0 = jnp.zeros((B, self.dim_out), x.dtype)
        c0 = jnp.zeros((B, self.dim_out), x.dtype)
        ys, (h_n, _) = UnidirLSTM(self.dim_out, name="rnn")(x, h0, c0)
        if input_lengths is not None:
            # last valid downsampled step per item
            ds_len = jnp.clip(input_lengths // (2 ** len(self.ref_enc_filters)), 1, T)
            h_n = jnp.take_along_axis(ys, (ds_len - 1)[:, None, None], axis=1)[:, 0]
        return h_n


class STL(nn.Module):
    """Style-token layer: attention of the reference embedding over learned
    token embeddings (style.py:79-109)."""

    num_tokens: int = 10
    dim_emb: int = 256
    num_heads: int = 4

    @nn.compact
    def __call__(self, inputs):
        embed = self.param(
            "embed",
            nn.initializers.normal(0.5),
            (self.num_tokens, self.dim_emb // self.num_heads),
        )
        B = inputs.shape[0]
        query = inputs[:, None, :]
        keys = jnp.broadcast_to(
            jnp.tanh(embed)[None], (B, self.num_tokens, embed.shape[-1])
        )
        return GSTMultiHeadAttention(self.dim_emb, self.num_heads, name="attention")(
            query, keys
        )


class GST(nn.Module):
    dim_emb: int = 256
    dim_enc: int = 128
    num_tokens: int = 10
    num_heads: int = 4

    @nn.compact
    def __call__(self, inputs, input_lengths=None, train: bool = False):
        enc = ReferenceEncoder(self.dim_enc, name="encoder")(
            inputs, input_lengths, train=train
        )
        style = STL(self.num_tokens, self.dim_emb, self.num_heads, name="stl")(enc)
        return style, {}


class VAE(nn.Module):
    """Variational reference encoder (style.py:125-151): reparameterized
    style embedding + KL to the unit gaussian."""

    dim_emb: int = 256
    dim_enc: int = 128
    dim_vae: int = 16

    @nn.compact
    def __call__(self, inputs, input_lengths=None, train: bool = False,
                 deterministic: bool = True):
        enc = ReferenceEncoder(self.dim_enc, name="encoder")(
            inputs, input_lengths, train=train
        )
        z_mean = Dense(self.dim_vae, name="mean_linear")(enc)
        z_logvar = Dense(self.dim_vae, name="logvar_linear")(enc)
        eps = jax.random.normal(self.make_rng("noise"), z_mean.shape, z_mean.dtype)
        z = eps * jnp.exp(0.5 * z_logvar) + z_mean
        kl = -(1 + z_logvar - z_mean**2 - jnp.exp(z_logvar)) / 2
        x = jnp.tanh(Dense(self.dim_emb, use_bias=False, name="fc_out")(z))[:, None, :]
        return x, {"kl": kl}


class GST_VAE(nn.Module):
    dim_emb: int = 256
    dim_enc: int = 128
    num_tokens: int = 10
    num_heads: int = 4
    dim_vae: int = 32

    @nn.compact
    def __call__(self, inputs, input_lengths=None, train: bool = False,
                 deterministic: bool = True):
        enc = ReferenceEncoder(self.dim_enc, name="encoder")(
            inputs, input_lengths, train=train
        )
        style = STL(self.num_tokens, self.dim_emb, self.num_heads, name="stl")(enc)
        z_mean = Dense(self.dim_vae, name="mean_linear")(style)
        z_logvar = Dense(self.dim_vae, name="logvar_linear")(style)
        eps = jax.random.normal(self.make_rng("noise"), z_mean.shape, z_mean.dtype)
        z = eps * jnp.exp(0.5 * z_logvar) + z_mean
        kl = -(1 + z_logvar - z_mean**2 - jnp.exp(z_logvar)) / 2
        x = Dense(self.dim_emb, use_bias=False, name="fc_out")(z)
        return x, {"kl": kl}
