"""Space-to-depth packed 1-D convolution.

TPU lanes are 128 wide; HiFi-GAN's late stages run k=3..11 dilated convs with
32-64 channels over 100k+ samples, wasting 2-4x of every vector register and
MXU tile. Packing P consecutive samples into channels turns a
[L, C] x (k, d) conv into an exactly-equivalent [L/P, P*C] x (k', 1) conv
whose channel dims fill the lanes:

  y[P q + b, co] = sum_{j, ci} x[P q + b + (j-p) d, ci] W[j, ci, co]
                 = sum_{J, a, ci} x_packed[q + J, a*C+ci] W_packed[J-Jmin, a*C+ci, b*C+co]

with W_packed a sparse scatter of W (each (j, b) pair lands in exactly one
(J, a) slot). FLOPs grow by the packing density but MXU utilization grows
16x for C=32; measured net win on the generator tail.

Output equality (not approximation) is tested against Conv1d in
tests/test_kernels.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def pack_conv_params(k: int, d: int, P: int, C_in: int, C_out: int):
    """Static packing plan: returns (k_pack, Jmin, scatter indices).

    scatter indices: arrays (jj, J, a, b) with one entry per (j, b) pair so
    W_packed[J - Jmin, a*C_in + ci, b*C_out + co] = W[jj, ci, co].
    """
    p = (k - 1) // 2
    entries = []
    for j in range(k):
        for b in range(P):
            delta = b + (j - p) * d
            J = delta // P  # floor division (handles negatives)
            a = delta - J * P
            entries.append((j, J, a, b))
    Js = [e[1] for e in entries]
    Jmin, Jmax = min(Js), max(Js)
    k_pack = Jmax - Jmin + 1
    jj = np.array([e[0] for e in entries], np.int32)
    JJ = np.array([e[1] - Jmin for e in entries], np.int32)
    aa = np.array([e[2] for e in entries], np.int32)
    bb = np.array([e[3] for e in entries], np.int32)
    return k_pack, Jmin, (jj, JJ, aa, bb)


def pack_weights(W: jax.Array, d: int, P: int) -> Tuple[jax.Array, int]:
    """W [k, C_in, C_out] -> (W_packed [k_pack, P*C_in, P*C_out], Jmin)."""
    k, C_in, C_out = W.shape
    k_pack, Jmin, (jj, JJ, aa, bb) = pack_conv_params(k, d, P, C_in, C_out)
    Wp = jnp.zeros((k_pack, P * C_in, P * C_out), W.dtype)
    # one scatter per (j, b) pair; k*P is small (<= 11*4 = 44) so unrolled
    for e in range(len(jj)):
        j, J, a, b = int(jj[e]), int(JJ[e]), int(aa[e]), int(bb[e])
        Wp = Wp.at[J, a * C_in : (a + 1) * C_in, b * C_out : (b + 1) * C_out].set(
            W[j]
        )
    return Wp, Jmin


def packed_conv1d(
    x: jax.Array, W: jax.Array, bias, d: int, P: int
) -> jax.Array:
    """'same'-padded dilated conv via packing. x [B, L, C_in] (L % P == 0),
    W [k, C_in, C_out] -> [B, L, C_out]. Bit-equivalent to Conv1d with
    padding=(k*d-d)//2, dilation=d."""
    B, L, C_in = x.shape
    k, _, C_out = W.shape
    Wp, Jmin = pack_weights(W, d, P)
    k_pack = Wp.shape[0]
    xp = x.reshape(B, L // P, P * C_in)
    y = jax.lax.conv_general_dilated(
        xp,
        Wp,
        window_strides=(1,),
        padding=[(-Jmin, k_pack - 1 + Jmin)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    y = y.reshape(B, L, C_out)
    if bias is not None:
        y = y + bias
    return y


def packed_conv1d_pre(
    xp: jax.Array, W: jax.Array, bias, d: int, P: int
) -> jax.Array:
    """packed_conv1d on ALREADY-PACKED input, returning packed output.

    xp [B, L/P, P*C_in], W [k, C_in, C_out] -> [B, L/P, P*C_out]. Identical
    math to packed_conv1d minus the outer reshapes — used by the decoder's
    packed tail, where activations stay in packed layout across ops instead
    of round-tripping [L, C] <-> [L/P, P*C] at every conv (each round trip
    is free as a reshape, but the unpacked intermediates cost 128/C times
    their logical bytes in lane-padded HBM traffic)."""
    Wp, Jmin = pack_weights(W, d, P)
    k_pack = Wp.shape[0]
    y = jax.lax.conv_general_dilated(
        xp,
        Wp.astype(xp.dtype),
        window_strides=(1,),
        padding=[(-Jmin, k_pack - 1 + Jmin)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if bias is not None:
        y = y + jnp.tile(bias, P).astype(y.dtype)
    return y


def pack_subpixel_transposed_weights(
    K: jax.Array, u: int, p: int, P_in: int
):
    """Packed-subpixel kernel for ConvTranspose1d on packed input.

    From y[s*u + r] = sum_q x[s - q] * K[q*u + r + p] (the subpixel identity;
    K [k, C_out, C_in]), with s = m*P_in + a: x[s - q] lives in packed block
    (m + J, alpha) where J = floor((a - q)/P_in), alpha = (a - q) mod P_in;
    the output lands in packed block (m, a*u + r) of a P_in*u-packed layout.
    Returns (W_big [J_len, P_in*C_in, P_in*u*C_out], Jmin) for a stride-1
    correlation with padding (-Jmin, Jmax)."""
    k, C_out, C_in = K.shape
    q_min = -((p + u - 1) // u)
    q_max = (k - 1 - p) // u

    # per-q sub-kernels [C_in, u*C_out] with invalid taps zeroed
    a_idx = np.arange(u)[None, :] + p + np.arange(q_min, q_max + 1)[:, None] * u
    valid = (a_idx >= 0) & (a_idx < k)  # [nq, u]
    a_clamped = np.clip(a_idx, 0, k - 1)
    KG = K[a_clamped.reshape(-1)].reshape(
        q_max - q_min + 1, u, C_out, C_in
    )
    KG = jnp.where(jnp.asarray(valid)[..., None, None], KG, 0.0)
    # [nq, u, C_out, C_in] -> [nq, C_in, u*C_out]
    sub = jnp.transpose(KG, (0, 3, 1, 2)).reshape(
        q_max - q_min + 1, C_in, u * C_out
    )

    entries = []
    for a in range(P_in):
        for q in range(q_min, q_max + 1):
            delta = a - q
            J = delta // P_in
            alpha = delta - J * P_in
            entries.append((a, q, J, alpha))
    Js = [e[2] for e in entries]
    Jmin, Jmax = min(Js), max(Js)
    J_len = Jmax - Jmin + 1
    W_big = jnp.zeros((J_len, P_in * C_in, P_in * u * C_out), K.dtype)
    for a, q, J, alpha in entries:
        W_big = W_big.at[
            J - Jmin,
            alpha * C_in : (alpha + 1) * C_in,
            a * u * C_out : (a + 1) * u * C_out,
        ].add(sub[q - q_min])
    return W_big, Jmin


def packed_subpixel_transposed_conv(
    xp: jax.Array, K: jax.Array, bias, u: int, p: int, P_in: int
) -> jax.Array:
    """ConvTranspose1d (k, stride u, padding p; out_len == in_len*u) on
    P_in-packed input -> (P_in*u)-packed output.

    xp [B, L/P_in, P_in*C_in], K [k, C_out, C_in] (the module's param
    layout) -> [B, L/P_in, P_in*u*C_out]."""
    C_out = K.shape[1]
    W_big, Jmin = pack_subpixel_transposed_weights(K, u, p, P_in)
    J_len = W_big.shape[0]
    y = jax.lax.conv_general_dilated(
        xp,
        W_big.astype(xp.dtype),
        window_strides=(1,),
        padding=[(-Jmin, J_len - 1 + Jmin)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if bias is not None:
        y = y + jnp.tile(bias, P_in * u).astype(y.dtype)
    return y


def repack(xp: jax.Array, P_from: int, P_to: int, C: int) -> jax.Array:
    """Change packing factor by reshape (free in row-major layout).
    xp [B, L/P_from, P_from*C] -> [B, L/P_to, P_to*C]."""
    if P_from == P_to:
        return xp
    B, Lp, _ = xp.shape
    L = Lp * P_from
    assert L % P_to == 0, (L, P_to)
    return xp.reshape(B, L // P_to, P_to * C)


def packed_mask_mul(xp: jax.Array, mask: jax.Array, P: int, C: int) -> jax.Array:
    """Multiply a P-packed activation by an UNPACKED [B, L, 1] mask."""
    if P == 1:
        return xp * mask
    B, Lp, _ = xp.shape
    m = mask.reshape(B, Lp, P, 1)
    return (xp.reshape(B, Lp, P, C) * m).reshape(B, Lp, P * C)
