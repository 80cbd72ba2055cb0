"""Fused tacotron decoder step (Pallas): the SURVEY §7 stage-5b kernel.

One kernel fuses the whole Taco2Prod serving step (decoder_cell.py:143-195
semantics, eval mode): PreNet -> attention-LSTM -> stepwise monotonic
attention -> context -> decoder-LSTM -> mel/stop projections. All weights
and the encoder memory stay VMEM-resident across the step; the five matmuls
ride the MXU back-to-back with the gate/attention elementwise work fused
between them (VPU), so one AR step is a single kernel launch.

Scope and the measured engineering call:
- VMEM (16 MB) bounds the fusable size: weights for dim_rnn <= ~320 fit
  entirely on-chip. The LJSpeech config (1024x2) needs ~75 MB of weights, so
  the full-size model keeps the XLA-compiled scan (already ~3.5 us/step,
  287k frames/s — scripts/bench_tacotron.py); this kernel is the
  speed-of-light path for small/realtime-embedded configs.
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


def _lstm(x, h, c, w_ih, w_hh, b, p_zoneout):
    gates = (
        jnp.dot(x, w_ih, preferred_element_type=jnp.float32)
        + jnp.dot(h, w_hh, preferred_element_type=jnp.float32)
        + b
    )
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
    q = jnp.dot(h_att, wts.query_w, preferred_element_type=jnp.float32)  # [B, Dc]
    # batched dots as broadcast-multiply + reduce (Mosaic has no batched
    # dot_general lowering; L*Dc elementwise work rides the VPU)
    e = jnp.sum(memory * q[:, None, :], axis=-1)  # [B, L]
    L = e.shape[1]
    last = jax.lax.broadcasted_iota(jnp.int32, e.shape, 1) == (L - 1)
    e = jnp.where(last, 1e4, e)
    p_stay = _isru_sigmoid(e)
    w0 = state.w * p_stay
    w1 = state.w * (1.0 - p_stay)
    w1s = jnp.pad(w1, ((0, 0), (1, 0)))[:, :-1]
    w_new = w0 + w1s
    if mmask is not None:
        w_new = w_new * mmask
    ctx = jnp.sum(memory * w_new[:, :, None], axis=1)  # [B, Dc]

    h_dec, c_dec = _lstm(
        jnp.concatenate([h_att, ctx], -1), state.h_dec, state.c_dec,
        wts.dec_w_ih, wts.dec_w_hh, wts.dec_b, p_zoneout,
    )
    out = jnp.concatenate([h_dec, ctx], -1)
    y = jnp.dot(out, wts.mel_w, preferred_element_type=jnp.float32) + wts.mel_b
    y = jnp.where(y >= 0, y, 0.01 * y)  # leaky_relu(0.01)
    s = jnp.dot(out, wts.stop_w, preferred_element_type=jnp.float32) + wts.stop_b
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
