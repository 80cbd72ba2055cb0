"""Marginalized monotonic-alignment probability prototype.

Equivalent of /root/reference/tools/alignment.py: given per-phoneme duration
distributions P [num_phonemes, max_duration+1], compute

  Q[i, j] = P(phonemes 0..i end exactly at frame j)       (duration convolution)
  A[i, j] = P(phoneme i is active at frame j)             (alignment marginal)

with the reference's convention: frame axis is 0-indexed after dropping the
"before the first frame" column; phoneme i starting at frame m+1 and lasting
>= d frames contributes Q[i-1, m] * Pcum[i, d] to A[i, m+d].

Two independent implementations — an explicit masked-sum DP and a conv1d
formulation — cross-checked by `self_test` (the reference's dual-
implementation idiom, alignment.py:156-172) and against a scalar-loop oracle
in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _survival(P: jax.Array) -> jax.Array:
    """Pcum[i, d] = P(duration_i >= d)."""
    return jnp.cumsum(P[:, ::-1], axis=1)[:, ::-1]


def _q_matrix_conv(P: jax.Array, T: int) -> jax.Array:
    N, Dp1 = P.shape
    q0 = jnp.zeros((T,)).at[: min(Dp1, T)].set(P[0, : min(Dp1, T)])

    def q_step(q_prev, p_row):
        q_new = jnp.convolve(q_prev, p_row, mode="full")[:T]
        return q_new, q_new

    _, q_rest = jax.lax.scan(q_step, q0, P[1:])
    return jnp.concatenate([q0[None], q_rest], axis=0)


def alignment_probabilities(P: jax.Array, num_frames: int):
    """Masked-sum DP. P: [N, D+1] -> (Q [N, T], A [N, T])."""
    N, Dp1 = P.shape
    max_d = Dp1 - 1
    T = num_frames
    Q = _q_matrix_conv(P, T)
    Pcum = _survival(P)

    # q_prev with a virtual m = -1 start slot (prob 1 for phoneme 0)
    qrow0 = jnp.zeros((T,)).at[0].set(1.0)
    q_shift = jnp.concatenate([qrow0[None], Q[:-1]], axis=0)  # [N, T]
    # q_shift[i, k] = P(phoneme i starts at frame k)  (k = m+1 shifted... )
    # more precisely: phoneme i starts right after phoneme i-1 ends at m,
    # i.e. at frame m+1; q_shift[i] indexes start offsets s = m+1 - 0? We
    # treat q_shift[i, s] with s in [0, T): phoneme 0 starts at s=0; phoneme
    # i>0 starts at s = m+1 where Q[i-1, m] — so shift by one frame:
    starts = jnp.concatenate(
        [qrow0[None], jnp.pad(Q[:-1], ((0, 0), (1, 0)))[:, :-1]], axis=0
    )
    starts = starts.at[0].set(qrow0)

    def a_row(start_row, pcum_row):
        # A[j] = sum_s start[s] * Pcum[j - s + 1] for j >= s
        def at_j(j):
            s = jnp.arange(T)
            d = j - s + 1
            pv = jnp.where((d >= 1) & (d <= max_d), pcum_row[jnp.clip(d, 0, max_d)], 0.0)
            return jnp.sum(start_row * pv)

        return jax.vmap(at_j)(jnp.arange(T))

    A = jax.vmap(a_row)(starts, Pcum)
    return Q, A


def alignment_probabilities_conv(P: jax.Array, num_frames: int):
    """Same quantities via convolutions (reference alignment.py:45-73)."""
    N, Dp1 = P.shape
    T = num_frames
    Q = _q_matrix_conv(P, T)
    Pcum = _survival(P)

    qrow0 = jnp.zeros((T,)).at[0].set(1.0)
    starts = jnp.concatenate(
        [qrow0[None], jnp.pad(Q[:-1], ((0, 0), (1, 0)))[:, :-1]], axis=0
    )
    starts = starts.at[0].set(qrow0)

    def a_row(start_row, pcum_row):
        # A[j] = sum_s start[s] * pcum1[j - s] with pcum1[d'] = Pcum[d'+1]
        return jnp.convolve(start_row, pcum_row[1:], mode="full")[:T]

    A = jax.vmap(a_row)(starts, Pcum)
    return Q, A


def random_duration_probs(rng: np.random.Generator, num_phonemes: int, max_duration: int):
    x = rng.standard_normal((num_phonemes, max_duration + 1))
    for i in range(num_phonemes):
        x[i, rng.integers(0, max_duration + 1)] = 10
    e = np.exp(x - x.max(axis=1, keepdims=True))
    return (e / e.sum(axis=1, keepdims=True)).astype(np.float32)


def self_test(seed: int = 0, num_phonemes: int = 5, max_duration: int = 4,
              num_frames: int = 24, tol: float = 1e-5) -> bool:
    """Cross-check the two implementations (norm tolerance, as the reference)."""
    rng = np.random.default_rng(seed)
    P = jnp.asarray(random_duration_probs(rng, num_phonemes, max_duration))
    Q1, A1 = alignment_probabilities(P, num_frames)
    Q2, A2 = alignment_probabilities_conv(P, num_frames)
    ok = (
        float(jnp.linalg.norm(Q1 - Q2)) < tol
        and float(jnp.linalg.norm(A1 - A2)) < tol
    )
    if ok:
        print("Test passed.")
    return ok


if __name__ == "__main__":
    assert self_test()
