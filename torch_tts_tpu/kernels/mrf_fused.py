"""Fused MRF (multi-receptive-field) resblock bank — whole-stage Pallas kernel.

One HiFi-GAN upsample stage runs `num_kernels` ResBlock1 banks off the same
input and averages them (/root/reference/vits2/models.py:944-952 +
modules.py:221-318; ours ops/hifigan.py). At the production LJSpeech shape
the C=128 stage is 18 convs x [65536, 128] with every intermediate
round-tripping HBM: XLA measures 5.0 ms against a ~1.45 ms bf16 compute
floor (BASELINE.md round-3 breakdown — the stage the roofline table names
"the next lever"). This kernel keeps the activations VMEM-resident across
the entire bank: the sequence is tiled into fixed windows with a
receptive-field halo, each grid step loads one window plus ALL conv weights
(constant-index BlockSpecs — fetched once, not per tile) and runs every
resblock iteration on it, writing back only the central `tile` frames of
the averaged output.

Convs are expressed as per-tap [W, C] x [C, C] MXU dots (Mosaic cannot
lane-concat shifted slices — see kernels/wn_stack._conv_taps), with STATIC
output-relative tap offsets, so the same kernel body serves plain dilated
convs (offsets (t - (k-1)//2) * d) and, in principle, any conv expressible
as offset taps.

Boundary semantics are EXACT: the monolithic path zero-pads every conv's
input outside [0, L), so intermediates simply do not exist there; inside a
window the kernel multiplies each conv output by an iota-derived validity
mask (pos in [0, L)), which reproduces the zero padding exactly — outputs
match the unfused ops/hifigan.py stage to fp32 accumulation order.

INFERENCE ONLY (no custom_vjp): the training step keeps the XLA path, so
the fused-WN lesson (custom_vjp severing cross-op fusion, BASELINE.md) does
not apply; the kernel boundary here cuts only the stage's own HBM
round-trips.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from torch_tts_tpu.kernels.wn_stack import _windows

# blocks spec type: tuple over resblocks of tuples over iterations of
#   ((offsets1, w1 [k1*C, C], b1 [C]), (offsets2, w2 [k2*C, C], b2 [C]))
# offsets are static python ints (output-relative tap positions).

_SLOPE = 0.1  # reference LRELU_SLOPE (vits2/modules.py:14)


def _lrelu(x):
    return jnp.where(x >= 0, x, x * _SLOPE)


def block_halo(offs_per_iter: Sequence[Tuple[Tuple[int, ...], Tuple[int, ...]]]):
    """One-side receptive-field reach of a resblock: per iteration the two
    convs compose, so their maximal |offset|s add."""
    h = 0
    for off1, off2 in offs_per_iter:
        h += max(max(off1), -min(off1)) + max(max(off2), -min(off2))
    return h


def _conv_off(x, w_ref, offsets, W: int, C: int):
    """Conv as per-tap dots with static output-relative offsets.

    out[r] = sum_j x[r + offsets[j]] @ w[j*C:(j+1)*C]; out-of-range reads
    are zeros (callers handle true boundary semantics via validity masks).
    """
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    parts = [x]
    if lo:
        parts.insert(0, jnp.zeros((lo, C), x.dtype))
    if hi:
        parts.append(jnp.zeros((hi, C), x.dtype))
    xp = jnp.concatenate(parts, axis=0) if len(parts) > 1 else x
    acc = None
    for j, o in enumerate(offsets):
        part = jnp.dot(
            xp[lo + o : lo + o + W],
            w_ref[j * C : (j + 1) * C],
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    return acc


def _mrf_kernel(xw_ref, *refs, spec, tile: int, halo: int, L: int):
    """One window: the full resblock bank, central `tile` frames written.

    xw_ref [1, 1, W, C] (W = tile + 2*halo); refs = interleaved
    (w_ref [k*C, C], b_ref [1, C]) per conv in spec order, then xo_ref.
    spec: tuple over blocks of tuples over iterations of (offsets1, offsets2).
    """
    xo_ref = refs[-1]
    refs = refs[:-1]
    x = xw_ref[0, 0]  # [W, C]
    W, C = x.shape
    t_idx = pl.program_id(1)
    pos = t_idx * tile - halo + jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    valid = jnp.logical_and(pos >= 0, pos < L).astype(x.dtype)  # [W, 1]

    acc = None
    r = 0
    for block in spec:
        xb = x
        for off1, off2 in block:
            w1, b1, w2, b2 = refs[r], refs[r + 1], refs[r + 2], refs[r + 3]
            r += 4
            xt = _lrelu(xb)
            xt = (_conv_off(xt, w1, off1, W, C) + b1[0]) * valid
            xt = _lrelu(xt)
            xt = (_conv_off(xt, w2, off2, W, C) + b2[0]) * valid
            xb = xb + xt
        acc = xb if acc is None else acc + xb
    out = acc / len(spec)
    xo_ref[0, 0] = out[halo : halo + tile]


def mrf_ref(x, blocks):
    """Plain-jnp oracle with the same (offsets, flat-weights) contract."""
    B, T, C = x.shape

    def conv(h, offsets, w, b):
        pl_, ph = max(0, -min(offsets)), max(0, max(offsets))
        hp = jnp.pad(h, ((0, 0), (pl_, ph), (0, 0)))
        out = None
        for j, o in enumerate(offsets):
            part = jnp.einsum(
                "btc,cf->btf", hp[:, pl_ + o : pl_ + o + T], w[j * C : (j + 1) * C]
            )
            out = part if out is None else out + part
        return out + b

    acc = None
    for block in blocks:
        xb = x
        for (off1, w1, b1), (off2, w2, b2) in block:
            xt = _lrelu(xb)
            xt = conv(xt, off1, w1, b1)
            xt = _lrelu(xt)
            xt = conv(xt, off2, w2, b2)
            xb = xb + xt
        acc = xb if acc is None else acc + xb
    return acc / len(blocks)


def mrf_fused(x, blocks, *, tile: int = 512, interpret: Optional[bool] = None):
    """Fused resblock bank. x [B, T, C] (C lane-aligned, ideally 128);
    blocks as documented at module top. Pallas on TPU (or interpret=True),
    jnp oracle elsewhere.

    Measured verdict (BASELINE.md round 3): bit-exact vs the unfused stage
    but 0.95x in-context — the C=128 stage is COMPUTE-bound at XLA's conv
    efficiency (~57 TFLOP/s), so removing its HBM round-trips buys nothing
    and the per-tap-dot structure plus halo overhead costs ~5%. bf16 dot
    inputs were also tried: Mosaic promotes them back to fp32 (identical
    numerics, no speedup), and the XLA path itself gains only 11% from
    bf16, confirming fp32 convs already run at near-bf16 MXU rate. Kept as
    an opt-in (`fuse_mrf`) exact kernel."""
    if interpret is None:
        if jax.default_backend() != "tpu":
            return mrf_ref(x, blocks)
        interpret = False
    B, T, C = x.shape
    spec = tuple(
        tuple((it[0][0], it[1][0]) for it in block) for block in blocks
    )
    halo = max(block_halo(b) for b in spec)
    tile = min(tile, max(8, T))
    (xw,), nT, W, Tp = _windows((x,), halo, tile, T)

    operands, in_specs = [xw], [
        pl.BlockSpec((1, 1, W, C), lambda b, t: (b, t, 0, 0))
    ]
    for block in blocks:
        for (off1, w1, b1), (off2, w2, b2) in block:
            for w, bias in ((w1, b1), (w2, b2)):
                kC = w.shape[0]
                operands.append(w)
                in_specs.append(
                    pl.BlockSpec((kC, C), lambda b, t: (0, 0))
                )
                operands.append(bias.reshape(1, C))
                in_specs.append(pl.BlockSpec((1, C), lambda b, t: (0, 0)))

    kernel = functools.partial(
        _mrf_kernel, spec=spec, tile=tile, halo=halo, L=T
    )
    xo = pl.pallas_call(
        kernel,
        grid=(B, nT),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, tile, C), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, nT, tile, C), x.dtype),
        interpret=interpret,
    )(*operands)
    return xo.reshape(B, Tp, C)[:, :T]


def dilated_offsets(k: int, d: int) -> Tuple[int, ...]:
    """Output-relative tap offsets of a 'same'-padded dilated conv."""
    p = (k - 1) // 2
    return tuple((t - p) * d for t in range(k))
