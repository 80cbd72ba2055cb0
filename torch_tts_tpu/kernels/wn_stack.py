"""Fused WaveNet (WN) gated dilated-conv stack — whole-stack Pallas kernel.

The WN block (/root/reference/vits2/modules.py:133-218; ours
ops/wavenet.py) is n_layers of

    x_in = conv_k(x) [+ g_l];  acts = tanh(a) * sigmoid(b)
    rs   = 1x1(acts);          x = (x + rs[:, :H]) * mask;  skip += rs[:, H:]

XLA executes this as one conv + one matmul per layer with every [T, H]
intermediate round-tripping HBM (measured ~5x above the FLOP floor at the
production shape, scripts/bench_breakdown.py). This kernel keeps the
activations VMEM-resident across a GROUP of layers: the sequence is tiled
into fixed windows with a 2*L-frame halo, each grid step loads one window
and runs all L layers on it (the k-tap dilated conv is one [W, k*H] x
[k*H, 2H] MXU matmul per layer), and only the central `tile` frames are
written back. Weights for the whole group ride a constant-index BlockSpec,
so they are fetched into VMEM once for the entire batch, not per tile.

Restrictions (production WN shapes satisfy all of them; ops/wavenet.py
falls back to the XLA path otherwise): dilation_rate == 1, p_dropout == 0,
odd kernel_size, speaker conditioning g broadcast over time ([B, 1, gin]).

Layer-count grouping: VMEM (~16 MB) holds ~4 layers of H=192 weights plus
the working set, so stacks longer than `group` layers (enc_q has 16) run as
chained kernel calls; x and the skip accumulator flow chunk to chunk in HBM
(4 round-trips instead of 16+). The final layer's [H, H] res_skip conv
(all-skip, no residual) is unified by zero-padding its weight to [H, 2H]:
the residual half contributes x += 0, exactly the reference's "last layer
leaves x alone".

Gradients: `wn_stack` is a jax.custom_vjp whose backward re-runs the plain
jnp reference under jax.vjp (rematerialized — no per-layer residuals are
stored, mirroring the remat the XLA path would need anyway). The forward
Pallas kernel and the reference produce the same values (tests), so mixing
them across fwd/bwd is exact.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# frames of halo per layer per side (kernel 5, dilation 1 -> 2)
_HALO_PER_LAYER = 2


# ---------------------------------------------------------------------------
# Reference implementation (plain jnp; differentiable; the parity oracle)
# ---------------------------------------------------------------------------


def wn_group_ref(x, mask, gl, w_in, b_in, w_rs, b_rs):
    """One group of L layers, generic padded-weight form.

    x [B, T, H]; mask [B, T, 1]; gl [B, L, 2H] or None; w_in [L, k, H, 2H];
    b_in [L, 2H]; w_rs [L, H, 2H]; b_rs [L, 2H] ->
    (x_out [B, T, H], skip [B, T, H]).
    """
    L, k = w_in.shape[0], w_in.shape[1]
    H = x.shape[-1]
    pad = (k - 1) // 2
    skip = jnp.zeros_like(x)
    for i in range(L):
        x_in = jax.lax.conv_general_dilated(
            x, w_in[i], window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + b_in[i]
        if gl is not None:
            x_in = x_in + gl[:, i, None, :]
        acts = jnp.tanh(x_in[..., :H]) * jax.nn.sigmoid(x_in[..., H:])
        rs = jnp.einsum("bth,hf->btf", acts, w_rs[i]) + b_rs[i]
        x = (x + rs[..., :H]) * mask
        skip = skip + rs[..., H:]
    return x, skip


# ---------------------------------------------------------------------------
# Pallas forward
# ---------------------------------------------------------------------------


def _wn_kernel(xw_ref, mw_ref, gl_ref, w_in_ref, b_in_ref, w_rs_ref,
               b_rs_ref, xo_ref, sk_ref, *, L: int, k: int, tile: int):
    """One window: all L layers, central `tile` frames written back.

    xw_ref [1, 1, W, H] window (W = tile + 2*halo, halo = 2*L);
    mw_ref [1, 1, W, 1]; gl_ref [1, L, 2H]; w_in_ref [L, k*H, 2H];
    outputs [1, 1, tile, H].
    """
    x = xw_ref[0, 0]          # [W, H]
    m = mw_ref[0, 0]          # [W, 1]
    W, H = x.shape
    pad = (k - 1) // 2
    halo = _HALO_PER_LAYER * L
    zeros = jnp.zeros((pad, H), x.dtype)
    skip = jnp.zeros((W, H), x.dtype)
    for i in range(L):
        xp = jnp.concatenate([zeros, x, zeros], axis=0)      # [W + k - 1, H]
        xk = jnp.concatenate(
            [xp[t : t + W] for t in range(k)], axis=1
        )                                                     # [W, k*H]
        x_in = (
            jnp.dot(xk, w_in_ref[i], preferred_element_type=jnp.float32)
            + b_in_ref[i]
            + gl_ref[0, i]
        )                                                     # [W, 2H]
        acts = jnp.tanh(x_in[:, :H]) * jax.nn.sigmoid(x_in[:, H:])
        rs = (
            jnp.dot(acts, w_rs_ref[i], preferred_element_type=jnp.float32)
            + b_rs_ref[i]
        )                                                     # [W, 2H]
        x = (x + rs[:, :H]) * m
        skip = skip + rs[:, H:]
    xo_ref[0, 0] = x[halo : halo + tile]
    sk_ref[0, 0] = skip[halo : halo + tile] * m[halo : halo + tile]


def _wn_group_pallas(x, mask, gl, w_in, b_in, w_rs, b_rs, *,
                     tile: int = 256, interpret: bool = False):
    """Pallas dispatch of one L-layer group. Same contract as wn_group_ref.

    NOTE the kernel masks the skip output by the window mask; callers of
    wn_group_ref get an unmasked skip. WN multiplies the total by the mask
    at the end anyway, and mask is 0/1, so the results agree wherever the
    caller applies the final mask (they agree everywhere in practice since
    x is masked layerwise, making skip zero in the masked region up to the
    conv halo; the final mask kills that halo in both paths).
    """
    B, T, H = x.shape
    L, k = w_in.shape[0], w_in.shape[1]
    halo = _HALO_PER_LAYER * L
    tile = min(tile, max(8, T))

    Tp = -(-T // tile) * tile           # padded length, multiple of tile
    nT = Tp // tile
    W = tile + 2 * halo

    xz = jnp.pad(x, ((0, 0), (halo, Tp - T + halo), (0, 0)))
    mz = jnp.pad(mask, ((0, 0), (halo, Tp - T + halo), (0, 0)))
    # overlapping windows materialized outside the kernel: ~ (W/tile - 1)
    # extra x traffic (a few %), which buys block-aligned BlockSpecs and no
    # manual DMA. [B, nT, W, C]
    idx = (jnp.arange(nT)[:, None] * tile + jnp.arange(W)[None, :])
    xw = xz[:, idx]                     # [B, nT, W, H]
    mw = mz[:, idx]                     # [B, nT, W, 1]

    if gl is None:
        gl = jnp.zeros((B, L, 2 * H), x.dtype)

    w_in_f = w_in.reshape(L, k * H, 2 * H)

    grid = (B, nT)
    out_shape = (
        jax.ShapeDtypeStruct((B, nT, tile, H), x.dtype),
        jax.ShapeDtypeStruct((B, nT, tile, H), x.dtype),
    )
    kernel = functools.partial(_wn_kernel, L=L, k=k, tile=tile)
    xo, sk = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, W, H), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, W, 1), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, L, 2 * H), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((L, k * H, 2 * H), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((L, 2 * H), lambda b, t: (0, 0)),
            pl.BlockSpec((L, H, 2 * H), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((L, 2 * H), lambda b, t: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, tile, H), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, tile, H), lambda b, t: (b, t, 0, 0)),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(xw, mw, gl, w_in_f, b_in, w_rs, b_rs)

    xo = xo.reshape(B, Tp, H)[:, :T]
    sk = sk.reshape(B, Tp, H)[:, :T]
    return xo, sk


# ---------------------------------------------------------------------------
# custom_vjp stack: groups of <= `group` layers, Pallas fwd on TPU
# ---------------------------------------------------------------------------


def _stack_ref(x, mask, gl, w_in, b_in, w_rs, b_rs, group: int):
    L = w_in.shape[0]
    skip = jnp.zeros_like(x)
    for s in range(0, L, group):
        e = min(s + group, L)
        gls = None if gl is None else gl[:, s:e]
        x, sk = wn_group_ref(x, mask, gls, w_in[s:e], b_in[s:e],
                             w_rs[s:e], b_rs[s:e])
        skip = skip + sk
    return skip * mask


def _stack_pallas(x, mask, gl, w_in, b_in, w_rs, b_rs, group: int,
                  tile: int, interpret: bool):
    L = w_in.shape[0]
    skip = jnp.zeros_like(x)
    for s in range(0, L, group):
        e = min(s + group, L)
        gls = None if gl is None else gl[:, s:e]
        x, sk = _wn_group_pallas(
            x, mask, gls, w_in[s:e], b_in[s:e], w_rs[s:e], b_rs[s:e],
            tile=tile, interpret=interpret,
        )
        skip = skip + sk
    return skip * mask


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def wn_stack(x, mask, gl, w_in, b_in, w_rs, b_rs, group: int = 4,
             tile: int = 256):
    """Full WN stack -> output [B, T, H] (the `output * x_mask` of WN).

    x [B, T, H]; mask [B, T, 1] (0/1); gl [B, L, 2H] per-layer speaker
    conditioning or None; w_in [L, k, H, 2H] effective (weight-normed) conv
    kernels; b_in [L, 2H]; w_rs [L, H, 2H] res/skip 1x1 kernels with the
    FINAL layer zero-padded in its residual half; b_rs [L, 2H] likewise.
    """
    if jax.default_backend() == "tpu":
        return _stack_pallas(x, mask, gl, w_in, b_in, w_rs, b_rs, group,
                             tile, False)
    return _stack_ref(x, mask, gl, w_in, b_in, w_rs, b_rs, group)


def _wn_stack_fwd(x, mask, gl, w_in, b_in, w_rs, b_rs, group, tile):
    out = wn_stack(x, mask, gl, w_in, b_in, w_rs, b_rs, group, tile)
    return out, (x, mask, gl, w_in, b_in, w_rs, b_rs)


def _wn_stack_bwd(group, tile, res, d_out):
    x, mask, gl, w_in, b_in, w_rs, b_rs = res
    # rematerialized backward through the jnp reference: exact same math as
    # the Pallas forward, so cross-path gradients are consistent.
    if gl is None:
        _, vjp = jax.vjp(
            lambda x_, w1, bb1, w2, bb2: _stack_ref(
                x_, mask, None, w1, bb1, w2, bb2, group
            ),
            x, w_in, b_in, w_rs, b_rs,
        )
        d_x, d_w_in, d_b_in, d_w_rs, d_b_rs = vjp(d_out)
        d_gl = None
    else:
        _, vjp = jax.vjp(
            lambda x_, gl_, w1, bb1, w2, bb2: _stack_ref(
                x_, mask, gl_, w1, bb1, w2, bb2, group
            ),
            x, gl, w_in, b_in, w_rs, b_rs,
        )
        d_x, d_gl, d_w_in, d_b_in, d_w_rs, d_b_rs = vjp(d_out)
    return d_x, None, d_gl, d_w_in, d_b_in, d_w_rs, d_b_rs


wn_stack.defvjp(_wn_stack_fwd, _wn_stack_bwd)
