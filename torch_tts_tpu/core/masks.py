"""Masking, segment slicing, and alignment-path helpers.

Functional equivalents of the reference's mask utilities
(/root/reference/vits2/commons.py:50-145, /root/reference/tacotron/data/util.py:4-7),
re-expressed for XLA: every function is shape-static and jit-safe; batch items
of different lengths are handled with boolean/float masks rather than ragged
tensors. Layout convention is channels-last [B, T, C].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sequence_mask(lengths: jax.Array, max_length: int) -> jax.Array:
    """[B] lengths -> [B, T] bool mask (True inside the sequence).

    Mirrors vits2/commons.py:123 `sequence_mask`, but `max_length` must be a
    static int under jit (the reference's `length.max()` default is dynamic).
    """
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def lengths_to_mask(lengths: jax.Array, max_length: int) -> jax.Array:
    """Alias matching tacotron/data/util.py:4 semantics (bool [B, T])."""
    return sequence_mask(lengths, max_length)


def mask_like(lengths: jax.Array, x: jax.Array, axis: int = 1) -> jax.Array:
    """[B] lengths -> float mask broadcastable against x along `axis`."""
    m = sequence_mask(lengths, x.shape[axis]).astype(x.dtype)
    shape = [1] * x.ndim
    shape[0] = x.shape[0]
    shape[axis] = x.shape[axis]
    return m.reshape(shape)


def slice_segments(x: jax.Array, ids_str: jax.Array, segment_size: int) -> jax.Array:
    """Gather fixed-size time segments per batch item.

    x: [B, T, C]; ids_str: [B] start frames -> [B, segment_size, C].
    Equivalent of vits2/commons.py:50 `slice_segments` (which loops in Python);
    here a vectorized dynamic-slice via gather of a window of indices.
    """
    b = x.shape[0]
    offs = jnp.arange(segment_size)
    idx = ids_str[:, None] + offs[None, :]  # [B, S]
    idx = jnp.clip(idx, 0, x.shape[1] - 1)
    return jax.vmap(lambda xi, ii: jnp.take(xi, ii, axis=0))(x, idx)


def rand_slice_segments(
    rng: jax.Array, x: jax.Array, x_lengths: jax.Array, segment_size: int
):
    """Random per-item segment starts in [0, len - segment + 1).

    Equivalent of vits2/commons.py:59 `rand_slice_segments`; PRNG is explicit.
    Returns (segments [B, S, C], ids_str [B]).
    """
    b = x.shape[0]
    ids_str_max = jnp.maximum(x_lengths - segment_size + 1, 1)
    u = jax.random.uniform(rng, (b,))
    ids_str = (u * ids_str_max.astype(u.dtype)).astype(jnp.int32)
    return slice_segments(x, ids_str, segment_size), ids_str


def generate_path(duration: jax.Array, t_y: int) -> jax.Array:
    """Durations -> hard monotonic alignment path.

    duration: [B, T_x] integer-valued durations -> path [B, T_y, T_x] in {0,1},
    where path[b, y, x] = 1 iff frame y is attributed to token x.
    Same cumsum + shifted-difference construction as vits2/commons.py:130
    `generate_path`, in [B, T_y, T_x] layout. Result should be multiplied by
    the caller's attn mask.
    """
    cum = jnp.cumsum(duration, axis=-1)  # [B, T_x]
    pos = jnp.arange(t_y, dtype=cum.dtype)  # [T_y]
    # before[b, y, x] = (y < cum[b, x])
    before = pos[None, :, None] < cum[:, None, :]  # [B, T_y, T_x]
    before = before.astype(duration.dtype)
    prev = jnp.pad(before, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
    return before - prev


def kl_divergence(m_p, logs_p, m_q, logs_q):
    """KL(P||Q) for diagonal gaussians; mirrors vits2/commons.py:30."""
    kl = (logs_q - logs_p) - 0.5
    kl += 0.5 * (jnp.exp(2.0 * logs_p) + (m_p - m_q) ** 2) * jnp.exp(-2.0 * logs_q)
    return kl


def intersperse_ids(ids, item: int):
    """Python-level list intersperse (vits2/commons.py:24): [a,b] -> [item,a,item,b,item]."""
    out = [item] * (len(ids) * 2 + 1)
    out[1::2] = ids
    return out


def subsequent_mask(length: int) -> jax.Array:
    """[1, T, T] lower-triangular causal mask (vits2/commons.py:97)."""
    return jnp.tril(jnp.ones((length, length), dtype=jnp.float32))[None]
