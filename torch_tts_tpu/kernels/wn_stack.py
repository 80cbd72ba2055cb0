"""Fused WaveNet (WN) gated dilated-conv stack — whole-stack Pallas kernels.

The WN block (/root/reference/vits2/modules.py:133-218; ours
ops/wavenet.py) is n_layers of

    x_in = conv_k(x) [+ g_l];  acts = tanh(a) * sigmoid(b)
    rs   = 1x1(acts);          x = (x + rs[:, :H]) * mask;  skip += rs[:, H:]

XLA executes this as one conv + one matmul per layer with every [T, H]
intermediate round-tripping HBM (measured well above the FLOP floor at the
production shape, scripts/bench_wn.py). These kernels keep the activations
VMEM-resident across a GROUP of layers: the sequence is tiled into fixed
windows with a 2*L-frame halo, each grid step loads one window and runs all
L layers on it (the k-tap conv is k per-tap [W, H] x [H, 2H] MXU dots per
layer — Mosaic cannot lane-concat shifted slices), and only the central
`tile` frames are written back. Weights ride
constant-index BlockSpecs, so they are fetched into VMEM once for the whole
batch, not per tile.

The backward is a second Pallas kernel (grid (B, nT)) that rematerializes
the group's forward inside each tile (no per-layer residuals in HBM) and
walks the layers in reverse with analytic gradients. Weight/bias/cond
gradients accumulate across sequential grid steps into constant-index
output blocks; every sequence position is CENTRAL to exactly one tile, and
only central positions contribute, so the accumulated sums are exact. The
conv's input-gradient and weight-gradient are k per-tap MXU dots (no
transposed weight copies held in VMEM).

Restrictions (production WN shapes satisfy all; ops/wavenet.py falls back
to the XLA path otherwise): dilation_rate == 1, inactive dropout, odd
kernel_size, speaker conditioning broadcast over time ([B, 1, gin]).

Grouping: VMEM (~16 MB) holds ~4 layers of H=192 weights + grads + working
set, so stacks longer than `group` layers (enc_q has 16) run as chained
`wn_group` calls; each group is its own jax.custom_vjp, and JAX chains
their VJPs, storing only the [B, T, H] inter-group activations. The final
layer's [H, H] res_skip conv (all-skip, no residual) is unified by
zero-padding its weight to [H, 2H] in ops/wavenet.py: the residual half
contributes x += 0, exactly the reference's "last layer leaves x alone".
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
    (x_out [B, T, H], skip [B, T, H] — skip is mask-multiplied).
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
    return x, skip * mask


# ---------------------------------------------------------------------------
# Pallas forward
# ---------------------------------------------------------------------------


def _conv_taps(x, w_in_l, k, W, H):
    """SAME conv as k per-tap MXU dots: sum_t x[r + t - pad] @ w[t].

    x [W, H]; w_in_l [k*H, 2H] (tap-major rows). A single [W, k*H] x
    [k*H, 2H] dot would be fewer MXU calls, but Mosaic cannot lane-concat
    the k shifted slices (their sublane offsets differ: "result/input
    offset mismatch on non-concat dimension"), so per-tap dots it is.
    """
    pad = (k - 1) // 2
    zeros = jnp.zeros((pad, H), x.dtype)
    xp = jnp.concatenate([zeros, x, zeros], axis=0)  # [W + k - 1, H]
    acc = None
    for t in range(k):
        part = jnp.dot(
            xp[t : t + W], w_in_l[t * H : (t + 1) * H],
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    return acc


def _wn_fwd_kernel(xw_ref, mw_ref, gl_ref, w_in_ref, b_in_ref, w_rs_ref,
                   b_rs_ref, xo_ref, sk_ref, *, L: int, k: int, tile: int):
    """One window: all L layers forward, central `tile` frames written.

    xw_ref [1, 1, W, H] (W = tile + 2*halo, halo = 2*L); mw_ref [1, 1, W, 1];
    gl_ref [1, L, 2H]; w_in_ref [L, k*H, 2H]; outputs [1, 1, tile, H].
    """
    x = xw_ref[0, 0]          # [W, H]
    m = mw_ref[0, 0]          # [W, 1]
    W, H = x.shape
    halo = _HALO_PER_LAYER * L
    skip = jnp.zeros((W, H), x.dtype)
    for i in range(L):
        x_in = (
            _conv_taps(x, w_in_ref[i], k, W, H)
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


def _windows(arrs, halo, tile, T):
    """Pad + materialize overlapping windows [B, nT, W, C] of each array
    outside the kernel (~(W/tile - 1) extra traffic, buys block-aligned
    BlockSpecs). Returns ([windows...], nT, W, Tp)."""
    Tp = -(-T // tile) * tile
    nT = Tp // tile
    W = tile + 2 * halo
    idx = jnp.arange(nT)[:, None] * tile + jnp.arange(W)[None, :]
    outs = []
    for a in arrs:
        az = jnp.pad(a, ((0, 0), (halo, Tp - T + halo), (0, 0)))
        outs.append(az[:, idx])
    return outs, nT, W, Tp


def _wn_group_pallas(x, mask, gl, w_in, b_in, w_rs, b_rs, *,
                     tile: int = 256, interpret: bool = False):
    """Pallas forward dispatch of one L-layer group; contract of
    wn_group_ref."""
    B, T, H = x.shape
    L, k = w_in.shape[0], w_in.shape[1]
    halo = _HALO_PER_LAYER * L
    tile = min(tile, max(8, T))
    (xw, mw), nT, W, Tp = _windows((x, mask), halo, tile, T)

    if gl is None:
        gl = jnp.zeros((B, L, 2 * H), x.dtype)
    w_in_f = w_in.reshape(L, k * H, 2 * H)

    kernel = functools.partial(_wn_fwd_kernel, L=L, k=k, tile=tile)
    xo, sk = pl.pallas_call(
        kernel,
        grid=(B, nT),
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
        out_shape=(
            jax.ShapeDtypeStruct((B, nT, tile, H), x.dtype),
            jax.ShapeDtypeStruct((B, nT, tile, H), x.dtype),
        ),
        interpret=interpret,
    )(xw, mw, gl, w_in_f, b_in, w_rs, b_rs)

    return (xo.reshape(B, Tp, H)[:, :T], sk.reshape(B, Tp, H)[:, :T])


# ---------------------------------------------------------------------------
# Pallas backward (rematerializing; analytic layer-reverse walk)
# ---------------------------------------------------------------------------


def _wn_bwd_kernel(xw_ref, mw_ref, gl_ref, w_in_ref, b_in_ref, w_rs_ref,
                   b_rs_ref, dxo_ref, dsk_ref,
                   dx0_ref, dgl_ref, dwin_ref, dbin_ref, dwrs_ref, dbrs_ref,
                   *, L: int, k: int, tile: int, halo: int):
    """Backward for one window. Cotangent windows (dxo/dsk) carry the same
    halo as the input window; weight/bias/cond grads accumulate across grid
    steps (central-position contributions only — exact, since each position
    is central to exactly one tile).

    halo must be 2 * _HALO_PER_LAYER * L (twice the forward's): the
    rematerialized forward is garbage within 2j frames of the window edge at
    layer j, and the reverse walk consumes ANOTHER 2 frames per layer of
    exact upstream values, so exact d_x0 at a central position needs 4L
    frames of distance from the window edge (2L is enough for the forward
    alone — verified by the multi-tile bwd parity test failing at 2L).
    """
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)
    first = jnp.logical_and(b_idx == 0, t_idx == 0)

    x = xw_ref[0, 0]          # [W, H]
    m = mw_ref[0, 0]          # [W, 1]
    W, H = x.shape
    pad = (k - 1) // 2
    central = jnp.logical_and(
        jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0) >= halo,
        jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0) < halo + tile,
    ).astype(x.dtype)                                        # [W, 1]

    # --- rematerialized forward: keep per-layer inputs and raw gate sums
    xs = []       # x entering layer i, [W, H]
    xins = []     # x_in (post bias/cond) for layer i, [W, 2H]
    for i in range(L):
        xs.append(x)
        x_in = (
            _conv_taps(x, w_in_ref[i], k, W, H)
            + b_in_ref[i]
            + gl_ref[0, i]
        )
        xins.append(x_in)
        acts = jnp.tanh(x_in[:, :H]) * jax.nn.sigmoid(x_in[:, H:])
        rs = (
            jnp.dot(acts, w_rs_ref[i], preferred_element_type=jnp.float32)
            + b_rs_ref[i]
        )
        x = (x + rs[:, :H]) * m

    # --- init accumulators on the first grid step
    @pl.when(first)
    def _init():
        dwin_ref[...] = jnp.zeros(dwin_ref.shape, dwin_ref.dtype)
        dbin_ref[...] = jnp.zeros(dbin_ref.shape, dbin_ref.dtype)
        dwrs_ref[...] = jnp.zeros(dwrs_ref.shape, dwrs_ref.dtype)
        dbrs_ref[...] = jnp.zeros(dbrs_ref.shape, dbrs_ref.dtype)

    @pl.when(t_idx == 0)
    def _init_gl():
        dgl_ref[...] = jnp.zeros(dgl_ref.shape, dgl_ref.dtype)

    def _cdot(a, b):
        # [W, F1]^T @ [W, F2] -> [F1, F2], contracting the sublane dim
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # --- reverse walk
    d_x = dxo_ref[0, 0]                       # cotangent wrt x_L, [W, H]
    d_skip = dsk_ref[0, 0] * m                # skip output was masked, [W, H]
    d_bins = [None] * L
    d_brss = [None] * L
    for i in range(L - 1, -1, -1):
        x_in = xins[i]
        t = jnp.tanh(x_in[:, :H])
        s = jax.nn.sigmoid(x_in[:, H:])
        acts = t * s

        d_masked = d_x * m                    # through the (.)*m update
        d_rs = jnp.concatenate([d_masked, d_skip], axis=1)   # [W, 2H]
        d_rs_c = d_rs * central

        # rs = acts @ w_rs + b_rs  (one-side central masking is exact)
        dwrs_ref[i] += _cdot(acts, d_rs_c)
        d_brss[i] = jnp.sum(d_rs_c, axis=0)                   # [2H]
        d_acts = jax.lax.dot_general(
            d_rs, w_rs_ref[i],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                     # [W, H]

        d_a = d_acts * s * (1.0 - t * t)
        d_b = d_acts * t * s * (1.0 - s)
        d_xin = jnp.concatenate([d_a, d_b], axis=1)           # [W, 2H]
        d_xin_c = d_xin * central

        d_bins[i] = jnp.sum(d_xin_c, axis=0)                  # [2H]

        # conv grads, per tap (w_in_ref[i] rows [tau*H:(tau+1)*H] = tap tau)
        x_i = xs[i]
        zeros_h = jnp.zeros((pad, H), x.dtype)
        xp = jnp.concatenate([zeros_h, x_i, zeros_h], axis=0)     # [W+k-1, H]
        zeros_f = jnp.zeros((pad, 2 * H), x.dtype)
        dp = jnp.concatenate([zeros_f, d_xin, zeros_f], axis=0)   # [W+k-1, 2H]
        d_x_new = d_masked                    # residual passthrough
        for tau in range(k):
            w_tau = w_in_ref[i][tau * H : (tau + 1) * H]          # [H, 2H]
            # dW[tau] += sum_p x[p + tau - pad] (x) d_xin[p], central p
            dwin_ref[i, tau * H : (tau + 1) * H] += _cdot(
                xp[tau : tau + W], d_xin_c
            )
            # d_x[q] += sum_tau d_xin[q + pad - tau] . w[tau]^T
            d_x_new = d_x_new + jax.lax.dot_general(
                dp[k - 1 - tau : k - 1 - tau + W], w_tau,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        d_x = d_x_new

    # bias/conditioning grads accumulated as whole [L, 2H] blocks (b_in and
    # gl enter x_in additively, so they share the per-layer sums; dgl
    # accumulates per batch item — its block index is b)
    d_bins = jnp.stack(d_bins)                                # [L, 2H]
    dbin_ref[...] += d_bins
    dgl_ref[0] += d_bins
    dbrs_ref[...] += jnp.stack(d_brss)
    dx0_ref[0, 0] = d_x[halo : halo + tile]


def _wn_group_pallas_bwd(x, mask, gl, w_in, b_in, w_rs, b_rs, d_xo, d_sk, *,
                         tile: int = 128, interpret: bool = False):
    """Pallas backward dispatch. Returns (d_x, d_gl, d_w_in, d_b_in,
    d_w_rs, d_b_rs). d_gl is [B, L, 2H] even when gl was None (caller
    drops it)."""
    B, T, H = x.shape
    L, k = w_in.shape[0], w_in.shape[1]
    halo = 2 * _HALO_PER_LAYER * L  # 4L: see _wn_bwd_kernel docstring
    tile = min(tile, max(8, T))
    (xw, mw, dxo_w, dsk_w), nT, W, Tp = _windows(
        (x, mask, d_xo, d_sk), halo, tile, T
    )

    if gl is None:
        gl = jnp.zeros((B, L, 2 * H), x.dtype)
    w_in_f = w_in.reshape(L, k * H, 2 * H)

    kernel = functools.partial(_wn_bwd_kernel, L=L, k=k, tile=tile,
                               halo=halo)
    dx0, dgl, dwin, dbin, dwrs, dbrs = pl.pallas_call(
        kernel,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, 1, W, H), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, W, 1), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, L, 2 * H), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((L, k * H, 2 * H), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((L, 2 * H), lambda b, t: (0, 0)),
            pl.BlockSpec((L, H, 2 * H), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((L, 2 * H), lambda b, t: (0, 0)),
            pl.BlockSpec((1, 1, W, H), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, W, H), lambda b, t: (b, t, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, tile, H), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, L, 2 * H), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((L, k * H, 2 * H), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((L, 2 * H), lambda b, t: (0, 0)),
            pl.BlockSpec((L, H, 2 * H), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((L, 2 * H), lambda b, t: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nT, tile, H), x.dtype),
            jax.ShapeDtypeStruct((B, L, 2 * H), x.dtype),
            jax.ShapeDtypeStruct((L, k * H, 2 * H), x.dtype),
            jax.ShapeDtypeStruct((L, 2 * H), x.dtype),
            jax.ShapeDtypeStruct((L, H, 2 * H), x.dtype),
            jax.ShapeDtypeStruct((L, 2 * H), x.dtype),
        ),
        interpret=interpret,
    )(xw, mw, gl, w_in_f, b_in, w_rs, b_rs, dxo_w, dsk_w)

    d_x = dx0.reshape(B, Tp, H)[:, :T]
    d_w_in = dwin.reshape(L, k, H, 2 * H)
    return d_x, dgl, d_w_in, dbin, dwrs, dbrs


# ---------------------------------------------------------------------------
# custom_vjp group op; stacks are plain chains of groups
# ---------------------------------------------------------------------------


@jax.custom_vjp
def wn_group(x, mask, gl, w_in, b_in, w_rs, b_rs):
    """One WN layer-group -> (x_out, skip*mask). Pallas on TPU, jnp ref
    elsewhere. gl may be None (no speaker conditioning)."""
    if jax.default_backend() == "tpu":
        return _wn_group_pallas(x, mask, gl, w_in, b_in, w_rs, b_rs)
    return wn_group_ref(x, mask, gl, w_in, b_in, w_rs, b_rs)


def _wn_group_fwd(x, mask, gl, w_in, b_in, w_rs, b_rs):
    out = wn_group(x, mask, gl, w_in, b_in, w_rs, b_rs)
    return out, (x, mask, gl, w_in, b_in, w_rs, b_rs)


def _wn_group_bwd(res, cts):
    x, mask, gl, w_in, b_in, w_rs, b_rs = res
    d_xo, d_sk = cts
    if jax.default_backend() == "tpu":
        d_x, d_gl, d_w_in, d_b_in, d_w_rs, d_b_rs = _wn_group_pallas_bwd(
            x, mask, gl, w_in, b_in, w_rs, b_rs, d_xo, d_sk
        )
        if gl is None:
            d_gl = None
        return d_x, None, d_gl, d_w_in, d_b_in, d_w_rs, d_b_rs
    # off-TPU: exact autodiff of the reference
    if gl is None:
        _, vjp = jax.vjp(
            lambda x_, w1, bb1, w2, bb2: wn_group_ref(
                x_, mask, None, w1, bb1, w2, bb2
            ),
            x, w_in, b_in, w_rs, b_rs,
        )
        d_x, d_w_in, d_b_in, d_w_rs, d_b_rs = vjp((d_xo, d_sk))
        d_gl = None
    else:
        _, vjp = jax.vjp(
            lambda x_, gl_, w1, bb1, w2, bb2: wn_group_ref(
                x_, mask, gl_, w1, bb1, w2, bb2
            ),
            x, gl, w_in, b_in, w_rs, b_rs,
        )
        d_x, d_gl, d_w_in, d_b_in, d_w_rs, d_b_rs = vjp((d_xo, d_sk))
    return d_x, None, d_gl, d_w_in, d_b_in, d_w_rs, d_b_rs


wn_group.defvjp(_wn_group_fwd, _wn_group_bwd)


def wn_stack(x, mask, gl, w_in, b_in, w_rs, b_rs, group: int = 4):
    """Full WN stack -> output [B, T, H] (the `output * x_mask` of WN).

    x [B, T, H]; mask [B, T, 1] (0/1); gl [B, L, 2H] per-layer speaker
    conditioning or None; w_in [L, k, H, 2H] effective (weight-normed) conv
    kernels; b_in [L, 2H]; w_rs [L, H, 2H] res/skip 1x1 kernels with the
    FINAL layer zero-padded in its residual half; b_rs [L, 2H] likewise.

    Chains custom_vjp groups of <= `group` layers; JAX stores only the
    [B, T, H] inter-group x between fwd and bwd.
    """
    L = w_in.shape[0]
    skip = jnp.zeros_like(x)
    for s in range(0, L, group):
        e = min(s + group, L)
        gls = None if gl is None else gl[:, s:e]
        x, sk = wn_group(x, mask, gls, w_in[s:e], b_in[s:e],
                         w_rs[s:e], b_rs[s:e])
        skip = skip + sk
    return skip


# retained for tests / diagnostics
def _stack_ref(x, mask, gl, w_in, b_in, w_rs, b_rs, group: int = 4):
    L = w_in.shape[0]
    skip = jnp.zeros_like(x)
    for s in range(0, L, group):
        e = min(s + group, L)
        gls = None if gl is None else gl[:, s:e]
        x, sk = wn_group_ref(x, mask, gls, w_in[s:e], b_in[s:e],
                             w_rs[s:e], b_rs[s:e])
        skip = skip + sk
    return skip
