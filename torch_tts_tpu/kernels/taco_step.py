"""Fused tacotron decoder step (Pallas): the SURVEY §7 stage-5b kernel.

One kernel fuses the whole Taco2Prod serving step (decoder_cell.py:143-195
semantics, eval mode): PreNet -> attention-LSTM -> stepwise monotonic
attention -> context -> decoder-LSTM -> mel/stop projections. All weights
and the encoder memory stay VMEM-resident across the step; the five matmuls
ride the MXU back-to-back with the gate/attention elementwise work fused
between them (VPU), so one AR step is a single kernel launch.

Scope and the measured engineering call:
- VMEM (16 MB) bounds the fully-resident size: weights for dim_rnn <= ~320
  fit entirely on-chip (`taco_step_fused`). The LJSpeech config (1024x2)
  needs ~75 MB of weights — `taco_step_streamed` covers it by keeping the
  four big LSTM matrices in HBM and double-buffering [K, n_tile] column
  tiles into VMEM with async DMA, so the MXU consumes tile t while tile
  t+1 is in flight. One AR step is still a single kernel launch; the step
  cost approaches the weight-bandwidth floor (~74 MB fp32 / 819 GB/s =
  ~90 us on v5e; bf16 weights halve it).
- eval-mode semantics only (dropout off, zoneout as its deterministic
  blend); training keeps the flax cell.

Validated against a pure-jnp transcription of the cell in tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class TacoStepWeights(NamedTuple):
    """Parameters of one Taco2Prod step, channels-last layouts."""

    prenet_w1: jax.Array  # [D_mel, P]
    prenet_b1: jax.Array  # [P]
    prenet_w2: jax.Array  # [P, P]
    prenet_b2: jax.Array  # [P]
    att_w_ih: jax.Array  # [P + Dc, 4*H1]
    att_w_hh: jax.Array  # [H1, 4*H1]
    att_b: jax.Array  # [4*H1] (b_ih + b_hh combined)
    query_w: jax.Array  # [H1, Dc]
    dec_w_ih: jax.Array  # [H1 + Dc, 4*H2]
    dec_w_hh: jax.Array  # [H2, 4*H2]
    dec_b: jax.Array  # [4*H2]
    mel_w: jax.Array  # [H2 + Dc, r*D_mel]
    mel_b: jax.Array  # [r*D_mel]
    stop_w: jax.Array  # [H2 + Dc, r]
    stop_b: jax.Array  # [r]


class TacoStepState(NamedTuple):
    w: jax.Array  # [B, L]
    ctx: jax.Array  # [B, Dc]
    h_att: jax.Array  # [B, H1]
    c_att: jax.Array  # [B, H1]
    h_dec: jax.Array  # [B, H2]
    c_dec: jax.Array  # [B, H2]


def _isru_sigmoid(x):
    h = x / 2.0
    return (1.0 + h / jnp.sqrt(1.0 + h * h)) / 2.0


def _lstm_from_gates(gates, h, c, b, p_zoneout):
    """LSTM nonlinearity given pre-bias gate pre-activations [B, 4H]."""
    gates = gates + b
    H = h.shape[-1]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    # zoneout eval blend (rnn.py:36-39)
    h_new = p_zoneout * h + (1 - p_zoneout) * h_new
    c_new = p_zoneout * c + (1 - p_zoneout) * c_new
    return h_new, c_new


def _lstm(x, h, c, w_ih, w_hh, b, p_zoneout):
    gates = jnp.dot(x, w_ih, preferred_element_type=jnp.float32) + jnp.dot(
        h, w_hh, preferred_element_type=jnp.float32
    )
    return _lstm_from_gates(gates, h, c, b, p_zoneout)


def _attend(h_att, w_prev, memory, mmask, query_w):
    """Stepwise-monotonic attention: returns (w_new, ctx)."""
    q = jnp.dot(h_att, query_w, preferred_element_type=jnp.float32)  # [B, Dc]
    # batched dots as broadcast-multiply + reduce (Mosaic has no batched
    # dot_general lowering; L*Dc elementwise work rides the VPU)
    e = jnp.sum(memory * q[:, None, :], axis=-1)  # [B, L]
    L = e.shape[1]
    last = jax.lax.broadcasted_iota(jnp.int32, e.shape, 1) == (L - 1)
    e = jnp.where(last, 1e4, e)
    p_stay = _isru_sigmoid(e)
    w0 = w_prev * p_stay
    w1 = w_prev * (1.0 - p_stay)
    w1s = jnp.pad(w1, ((0, 0), (1, 0)))[:, :-1]
    w_new = w0 + w1s
    if mmask is not None:
        w_new = w_new * mmask
    ctx = jnp.sum(memory * w_new[:, :, None], axis=1)  # [B, Dc]
    return w_new, ctx


def _project_out(h_dec, ctx, wts: TacoStepWeights):
    out = jnp.concatenate([h_dec, ctx], -1)
    y = jnp.dot(out, wts.mel_w, preferred_element_type=jnp.float32) + wts.mel_b
    y = jnp.where(y >= 0, y, 0.01 * y)  # leaky_relu(0.01)
    s = jnp.dot(out, wts.stop_w, preferred_element_type=jnp.float32) + wts.stop_b
    return y, s


def _step_math(y_in, state: TacoStepState, memory, mmask, wts: TacoStepWeights,
               p_zoneout: float):
    """Shared forward math (used by both the jnp reference and the kernel)."""
    x = jax.nn.relu(jnp.dot(y_in, wts.prenet_w1,
                            preferred_element_type=jnp.float32) + wts.prenet_b1)
    x_pre = jax.nn.relu(jnp.dot(x, wts.prenet_w2,
                                preferred_element_type=jnp.float32) + wts.prenet_b2)

    h_att, c_att = _lstm(
        jnp.concatenate([x_pre, state.ctx], -1), state.h_att, state.c_att,
        wts.att_w_ih, wts.att_w_hh, wts.att_b, p_zoneout,
    )
    w_new, ctx = _attend(h_att, state.w, memory, mmask, wts.query_w)
    h_dec, c_dec = _lstm(
        jnp.concatenate([h_att, ctx], -1), state.h_dec, state.c_dec,
        wts.dec_w_ih, wts.dec_w_hh, wts.dec_b, p_zoneout,
    )
    y, s = _project_out(h_dec, ctx, wts)
    new_state = TacoStepState(w_new, ctx, h_att, c_att, h_dec, c_dec)
    return y, s, new_state


def taco_step_ref(y_in, state, memory, mmask, wts, p_zoneout: float = 0.1):
    """Pure-jnp reference implementation (the parity oracle)."""
    return _step_math(y_in, state, memory, mmask, wts, p_zoneout)


def _kernel(p_zoneout, y_ref, w_ref, ctx_ref, ha_ref, ca_ref, hd_ref, cd_ref,
            mem_ref, mask_ref, *wrefs_and_outs):
    n_w = len(TacoStepWeights._fields)
    wrefs = wrefs_and_outs[:n_w]
    (y_out, s_out, w_out, ctx_out, ha_out, ca_out, hd_out, cd_out) = (
        wrefs_and_outs[n_w:]
    )
    wts = TacoStepWeights(*[r[:] for r in wrefs])
    state = TacoStepState(
        w_ref[:], ctx_ref[:], ha_ref[:], ca_ref[:], hd_ref[:], cd_ref[:]
    )
    y, s, ns = _step_math(y_ref[:], state, mem_ref[:], mask_ref[:], wts,
                          p_zoneout)
    y_out[:] = y
    s_out[:] = s
    w_out[:] = ns.w
    ctx_out[:] = ns.ctx
    ha_out[:] = ns.h_att
    ca_out[:] = ns.c_att
    hd_out[:] = ns.h_dec
    cd_out[:] = ns.c_dec


def taco_step_fused(
    y_in, state: TacoStepState, memory, mmask, wts: TacoStepWeights,
    p_zoneout: float = 0.1, interpret: bool = False,
):
    """Fused single-kernel step. Same contract as taco_step_ref."""
    B = y_in.shape[0]
    r_mel = wts.mel_b.shape[0]
    r = wts.stop_b.shape[0]
    out_shapes = (
        jax.ShapeDtypeStruct((B, r_mel), jnp.float32),  # y
        jax.ShapeDtypeStruct((B, r), jnp.float32),  # s
        jax.ShapeDtypeStruct(state.w.shape, jnp.float32),
        jax.ShapeDtypeStruct(state.ctx.shape, jnp.float32),
        jax.ShapeDtypeStruct(state.h_att.shape, jnp.float32),
        jax.ShapeDtypeStruct(state.c_att.shape, jnp.float32),
        jax.ShapeDtypeStruct(state.h_dec.shape, jnp.float32),
        jax.ShapeDtypeStruct(state.c_dec.shape, jnp.float32),
    )
    mask = mmask if mmask is not None else jnp.ones_like(state.w)
    outs = pl.pallas_call(
        functools.partial(_kernel, p_zoneout),
        out_shape=out_shapes,
        interpret=interpret,
    )(
        y_in.astype(jnp.float32),
        state.w.astype(jnp.float32), state.ctx.astype(jnp.float32),
        state.h_att.astype(jnp.float32), state.c_att.astype(jnp.float32),
        state.h_dec.astype(jnp.float32), state.c_dec.astype(jnp.float32),
        memory.astype(jnp.float32), mask.astype(jnp.float32),
        *[w.astype(jnp.float32) for w in wts],
    )
    y, s = outs[0], outs[1]
    return y, s, TacoStepState(*outs[2:])


# -- streamed variant: big LSTM matrices stay in HBM ----------------------

_BIG = ("att_w_ih", "att_w_hh", "dec_w_ih", "dec_w_hh")
_SMALL = tuple(f for f in TacoStepWeights._fields if f not in _BIG)


def _streamed_kernel(p_zoneout, n_tile, gemv, y_ref, w_ref, ctx_ref, ha_ref,
                     ca_ref, hd_ref, cd_ref, mem_ref, mask_ref,
                     *rest):
    n_small = len(_SMALL)
    small = dict(zip(_SMALL, rest[:n_small]))
    att_w, dec_w = rest[n_small:n_small + 2]
    (y_out, s_out, w_out, ctx_out, ha_out, ca_out, hd_out, cd_out,
     scr, gates, sem) = rest[n_small + 2:]

    def stream_gates(xh, w):
        """xh @ w with the [K, 4H] matrix streamed from HBM in [K, n_tile]
        column tiles, double-buffered: the dot on tile t runs while tile
        t+1's DMA is in flight. The caller pre-concatenates the LSTM's
        w_ih/w_hh rows (and xh = [x, h]) so each phase streams ONE matrix
        with one DMA per tile."""
        K, N = w.shape
        n_tiles = N // n_tile
        xc = xh.astype(w.dtype)
        if gemv == "vpu":
            # B=1 matvec: the MXU would light 1/128 rows, so ride the VPU
            # instead — broadcast-multiply the [K, n_tile] weight tile by
            # the activation COLUMN and reduce over K. One transpose per
            # phase ([1,K] -> [K,1] relayout), then each tile is pure
            # elementwise-MAC work that overlaps the next tile's DMA.
            xv = jnp.transpose(xc)  # [K, 1]

        def copy(slot, t):
            return pltpu.make_async_copy(
                w.at[:, pl.ds(t * n_tile, n_tile)], scr.at[slot, 0:K],
                sem.at[slot])

        copy(0, 0).start()

        def loop(t, carry):
            slot = jax.lax.rem(t, 2)

            @pl.when(t + 1 < n_tiles)
            def _():
                copy(jax.lax.rem(t + 1, 2), t + 1).start()

            copy(slot, t).wait()
            if gemv == "vpu":
                tile = jnp.sum(
                    (scr[slot, 0:K] * xv).astype(jnp.float32), axis=0,
                )[None, :]
            else:
                tile = jnp.dot(xc, scr[slot, 0:K],
                               preferred_element_type=jnp.float32)
            gates[:, pl.ds(t * n_tile, n_tile)] = tile
            return carry

        jax.lax.fori_loop(0, n_tiles, loop, 0)
        return gates[:, 0:N]

    f32 = lambda r: r[:].astype(jnp.float32)  # noqa: E731
    x = jax.nn.relu(
        jnp.dot(y_ref[:], f32(small["prenet_w1"]),
                preferred_element_type=jnp.float32) + f32(small["prenet_b1"]))
    x_pre = jax.nn.relu(
        jnp.dot(x, f32(small["prenet_w2"]),
                preferred_element_type=jnp.float32) + f32(small["prenet_b2"]))

    g_att = stream_gates(
        jnp.concatenate([x_pre, ctx_ref[:], ha_ref[:]], -1), att_w)
    h_att, c_att = _lstm_from_gates(
        g_att, ha_ref[:], ca_ref[:], f32(small["att_b"]), p_zoneout)

    w_new, ctx = _attend(h_att, w_ref[:], mem_ref[:], mask_ref[:],
                         f32(small["query_w"]))

    g_dec = stream_gates(
        jnp.concatenate([h_att, ctx, hd_ref[:]], -1), dec_w)
    h_dec, c_dec = _lstm_from_gates(
        g_dec, hd_ref[:], cd_ref[:], f32(small["dec_b"]), p_zoneout)

    out = jnp.concatenate([h_dec, ctx], -1)
    y = jnp.dot(out, f32(small["mel_w"]),
                preferred_element_type=jnp.float32) + f32(small["mel_b"])
    y_out[:] = jnp.where(y >= 0, y, 0.01 * y)  # leaky_relu(0.01)
    s_out[:] = jnp.dot(out, f32(small["stop_w"]),
                       preferred_element_type=jnp.float32) + f32(small["stop_b"])
    w_out[:] = w_new
    ctx_out[:] = ctx
    ha_out[:] = h_att
    ca_out[:] = c_att
    hd_out[:] = h_dec
    cd_out[:] = c_dec


def taco_step_streamed(
    y_in, state: TacoStepState, memory, mmask, wts: TacoStepWeights,
    p_zoneout: float = 0.1, n_tile: int = 512, gemv: str = "mxu",
    interpret: bool = False,
):
    """Fused step for models whose LSTM matrices exceed VMEM: the four big
    matrices (att/dec x ih/hh) stay in HBM — in bfloat16 if the caller
    stores them so, halving the streamed bytes — and are consumed in
    double-buffered [K, n_tile] column tiles. Same contract as
    taco_step_ref; activations/state/attention stay float32.
    """
    B = y_in.shape[0]
    r_mel = wts.mel_b.shape[0]
    r = wts.stop_b.shape[0]
    n4h_att = wts.att_w_hh.shape[1]
    n4h_dec = wts.dec_w_hh.shape[1]
    for n, name in ((n4h_att, "att"), (n4h_dec, "dec")):
        if n % n_tile:
            raise ValueError(
                f"4*H_{name}={n} not divisible by n_tile={n_tile}")
    wdt = wts.att_w_ih.dtype
    # one streamed matrix per LSTM: [w_ih; w_hh] rows stacked, consumed by
    # a single dot on [x_cat, h]. Loop-invariant under a scan, so XLA
    # hoists the concatenation out of the AR loop (one HBM copy per decode)
    att_w = jnp.concatenate(
        [wts.att_w_ih.astype(wdt), wts.att_w_hh.astype(wdt)], 0)
    dec_w = jnp.concatenate(
        [wts.dec_w_ih.astype(wdt), wts.dec_w_hh.astype(wdt)], 0)
    k_max = max(att_w.shape[0], dec_w.shape[0])

    out_shapes = (
        jax.ShapeDtypeStruct((B, r_mel), jnp.float32),  # y
        jax.ShapeDtypeStruct((B, r), jnp.float32),  # s
        jax.ShapeDtypeStruct(state.w.shape, jnp.float32),
        jax.ShapeDtypeStruct(state.ctx.shape, jnp.float32),
        jax.ShapeDtypeStruct(state.h_att.shape, jnp.float32),
        jax.ShapeDtypeStruct(state.c_att.shape, jnp.float32),
        jax.ShapeDtypeStruct(state.h_dec.shape, jnp.float32),
        jax.ShapeDtypeStruct(state.c_dec.shape, jnp.float32),
    )
    mask = mmask if mmask is not None else jnp.ones_like(state.w)
    n_state_in = 9  # y + 6 state + memory + mask
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    small = [getattr(wts, f).astype(jnp.float32) for f in _SMALL]
    if gemv not in ("mxu", "vpu"):
        raise ValueError(f"gemv must be mxu/vpu, got {gemv!r}")
    if gemv == "vpu" and B != 1:
        raise ValueError("gemv='vpu' is the B=1 serving path")
    outs = pl.pallas_call(
        functools.partial(_streamed_kernel, p_zoneout, n_tile, gemv),
        out_shape=out_shapes,
        in_specs=[vmem] * (n_state_in + len(_SMALL)) + [hbm, hbm],
        out_specs=tuple([vmem] * len(out_shapes)),
        scratch_shapes=[
            pltpu.VMEM((2, k_max, n_tile), wdt),      # scr (weight tiles)
            pltpu.VMEM((B, max(n4h_att, n4h_dec)), jnp.float32),  # gates
            pltpu.SemaphoreType.DMA((2,)),            # sem
        ],
        interpret=interpret,
    )(
        y_in.astype(jnp.float32),
        state.w.astype(jnp.float32), state.ctx.astype(jnp.float32),
        state.h_att.astype(jnp.float32), state.c_att.astype(jnp.float32),
        state.h_dec.astype(jnp.float32), state.c_dec.astype(jnp.float32),
        memory.astype(jnp.float32), mask.astype(jnp.float32),
        *small, att_w, dec_w,
    )
    y, s = outs[0], outs[1]
    return y, s, TacoStepState(*outs[2:])


def weights_from_cell_params(cell_params, dec_params) -> TacoStepWeights:
    """Extract kernel weights from the flax Taco2ProdDecoderCell/Decoder
    param trees (models/tacotron/model.py naming)."""
    c = cell_params
    att = c["attention_rnn"]["cell"]
    dec = c["decoder_rnn"]["cell"]
    return TacoStepWeights(
        prenet_w1=c["pre_net"]["fc1"]["kernel"],
        prenet_b1=c["pre_net"]["fc1"]["bias"],
        prenet_w2=c["pre_net"]["fc2"]["kernel"],
        prenet_b2=c["pre_net"]["fc2"]["bias"],
        att_w_ih=att["w_ih"],
        att_w_hh=att["w_hh"],
        att_b=att["b_ih"] + att["b_hh"],
        query_w=c["attention"]["query_layer"]["kernel"],
        dec_w_ih=dec["w_ih"],
        dec_w_hh=dec["w_hh"],
        dec_b=dec["b_ih"] + dec["b_hh"],
        mel_w=dec_params["fc_mel"]["kernel"],
        mel_b=dec_params["fc_mel"]["bias"],
        stop_w=dec_params["fc_stop"]["kernel"],
        stop_b=dec_params["fc_stop"]["bias"],
    )
