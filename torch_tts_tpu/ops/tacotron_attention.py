"""Tacotron attention mechanisms.

Equivalents of /root/reference/tacotron/modules/attention.py: content-based
attention variants, the tri-diagonal Markov transition attention
(attention.md:1-33 describes the scheme), stepwise monotonic attention with
training-time sigmoid noise, and the GST-style multi-head attention.

All operate on a single decoder step: query x [B, D_in], previous weights
w [B, L], memory [B, L, D_ctx] -> new weights [B, L]. The weight-propagation
shifts are expressed as pad/slice adds (XLA fuses them; no rolls of dynamic
extent).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from torch_tts_tpu.ops.layers import Dense
from torch_tts_tpu.ops.tacotron_blocks import isru_sigmoid


def initial_att_weights(batch_size: int, memory_size: int, dtype=jnp.float32):
    """One-hot at position 0 (decoder_cell.py:9-17)."""
    w = jnp.zeros((batch_size, memory_size), dtype)
    return w.at[:, 0].set(1.0)


class ContentConcatAttention(nn.Module):
    dim_hidden: int

    @nn.compact
    def __call__(self, x, w, memory, cmask=None, deterministic: bool = True):
        L = memory.shape[1]
        xe = jnp.broadcast_to(x[:, None, :], (x.shape[0], L, x.shape[-1]))
        score = Dense(1, use_bias=False, name="fc2")(
            jnp.tanh(
                Dense(self.dim_hidden, use_bias=False, name="fc1")(
                    jnp.concatenate([memory, xe], axis=-1)
                )
            )
        )[..., 0]
        if cmask is not None:
            score = jnp.where(cmask, score, -1e12)
        return jax.nn.softmax(score, axis=1)


class ContentGeneralAttention(nn.Module):
    dim_context: int

    @nn.compact
    def __call__(self, x, w, memory, cmask=None, deterministic: bool = True):
        q = Dense(self.dim_context, name="score_net")(x)  # [B, D_ctx]
        score = jnp.einsum("bld,bd->bl", memory, q)
        if cmask is not None:
            score = jnp.where(cmask, score, -1e12)
        return jax.nn.softmax(score, axis=1)


class ContentMarkovAttention(nn.Module):
    """Tri-diagonal Markov transition attention (attention.py:53-93): each
    memory position emits a 3-way softmax over {stay, advance 1, advance 2}
    and the previous weights are propagated through those transitions."""

    dim_context: int
    num_probs: int = 3

    @nn.compact
    def __call__(self, x, w, memory, cmask=None, deterministic: bool = True):
        B, L, D = memory.shape
        P = self.num_probs
        q = Dense(P * self.dim_context, use_bias=False, name="fc_query")(x)
        q = q.reshape(B, self.dim_context, P)
        e = jnp.einsum("bld,bdp->blp", memory, q)  # [B, L, P]

        if cmask is not None:
            # forbid transitions that would land past each item's length
            cmask_inv = ~cmask  # [B, L]
            shifted = jnp.stack(
                [jnp.roll(cmask_inv, -n, axis=1) for n in range(P)], axis=2
            )
            e = jnp.where(shifted, -1e12, e)
        # forbid advancing past the end of the padded memory
        pos = jnp.arange(L)
        for n in range(1, P):
            e = jnp.where((pos >= L - n)[None, :, None] &
                          (jnp.arange(P) == n)[None, None, :], -1e12, e)
        p = jax.nn.softmax(e, axis=2)

        wp = w[..., None] * p  # [B, L, P]
        out = wp[:, :, 0]
        for n in range(1, P):
            out = out.at[:, n:].add(wp[:, :-n, n])
        return out


class StepwiseMonotonicAttention(nn.Module):
    """Stay/advance monotonic attention (attention.py:96-126): a sigmoid gate
    per position splits the previous weight between staying and moving one
    step right; training adds sigmoid noise for discreteness pressure."""

    dim_context: int
    sigmoid_noise: float = 1.0

    @nn.compact
    def __call__(self, x, w, memory, cmask=None, deterministic: bool = True):
        q = Dense(self.dim_context, use_bias=False, name="query_layer")(x)
        e = jnp.einsum("bld,bd->bl", memory, q)
        if not deterministic and self.sigmoid_noise > 0:
            e = e + self.sigmoid_noise * jax.random.normal(
                self.make_rng("noise"), e.shape, e.dtype
            )
        e = e.at[:, -1].set(1e4)  # sink state: always stay at the last position
        p_stay = isru_sigmoid(e)
        w0 = w * p_stay
        w1 = w * (1.0 - p_stay)
        out = w0.at[:, 1:].add(w1[:, :-1])
        return out


class GSTMultiHeadAttention(nn.Module):
    """Style-token multi-head attention (attention.py:129-186): separate
    q/k/v projections to num_units, softmax over keys."""

    num_units: int
    num_heads: int

    @nn.compact
    def __call__(self, query, key, key_mask=None):
        d_gain = 1.0 / jnp.sqrt(jnp.asarray(key.shape[-1], jnp.float32))
        q = Dense(self.num_units, use_bias=False, name="W_query")(query)
        k = Dense(self.num_units, use_bias=False, name="W_key")(key)
        v = Dense(self.num_units, use_bias=False, name="W_value")(key)
        B, Tq, _ = q.shape
        Tk = k.shape[1]
        H = self.num_heads
        d = self.num_units // H
        qh = q.reshape(B, Tq, H, d).transpose(0, 2, 1, 3)
        kh = k.reshape(B, Tk, H, d).transpose(0, 2, 1, 3)
        vh = v.reshape(B, Tk, H, d).transpose(0, 2, 1, 3)
        scores = d_gain * jnp.einsum("bhqd,bhkd->bhqk", qh, kh)
        if key_mask is not None:
            scores = jnp.where(key_mask[:, None, None, :], scores, -1e6)
        p = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
        return out.transpose(0, 2, 1, 3).reshape(B, Tq, self.num_units)
