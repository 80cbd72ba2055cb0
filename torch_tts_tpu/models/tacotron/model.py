"""Tacotron-style attention seq2seq mel synthesizer.

TPU-native equivalent of the reference tacotron stack:
- Encoder / Encoder2 (/root/reference/tacotron/encoder.py): embedding ->
  conv+BN+ISRLU stack with concat skip -> BiLSTM with learned initial state.
- Decoder cells (/root/reference/tacotron/decoder_cell.py): three variants
  (Taco1 GRU+Markov attention, Taco2 post-RNN attention, Taco2Prod
  attention-LSTM -> monotonic attention -> decoder-LSTM). All return
  (output, context, state).
- Decoder (/root/reference/tacotron/decoder.py): the reference's Python
  `while True` autoregressive loop becomes one `lax.scan` to a static step
  count with teacher-forcing selects and per-item stop masks — the whole
  AR loop compiles into a single XLA while-op on TPU.
- Tacotron assembly + build_tacotron (/root/reference/tacotron/tacotron.py).

Stopping semantics: the reference breaks its inference loop when *any* batch
item emits a stop logit below threshold (decoder.py:68-71). Under jit we
always scan max_steps and return per-item `stop_lengths` computed from the
same threshold — callers mask/trim with them (identical result for B=1).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from torch_tts_tpu.core.config import TacotronConfig
from torch_tts_tpu.core.masks import sequence_mask
from torch_tts_tpu.ops.layers import Conv1d, Dense, Dropout, Embed
from torch_tts_tpu.ops.rnn import BiLSTM, GRUCell, LSTMZoneoutCell, ResGRUCell
from torch_tts_tpu.ops.style import GST, VAE
from torch_tts_tpu.ops.tacotron_attention import (
    ContentMarkovAttention,
    StepwiseMonotonicAttention,
    initial_att_weights,
)
from torch_tts_tpu.ops.tacotron_blocks import CBHG, BatchNorm, MelPostnet, MelPostnet2, PreNet, isrlu


class Encoder(nn.Module):
    """Tacotron-1 encoder: emb -> PreNet -> CBHG (encoder.py:11-24)."""

    alphabet_size: int
    dim_out: int = 256
    dim_emb: int = 256

    @nn.compact
    def __call__(self, x, x_lengths, train: bool = False, deterministic: bool = True):
        h = Embed(self.alphabet_size, self.dim_emb, name="emb")(x)
        h = PreNet(128, name="pre_net")(h, deterministic=deterministic)
        return CBHG(self.dim_out, name="cbhg")(h, train=train)


class Encoder2(nn.Module):
    """Tacotron-2 encoder (encoder.py:27-82): 3 conv layers (k=5, BN, ISRLU)
    with a concat skip from the embedding, then a BiLSTM with learned h0/c0."""

    alphabet_size: int
    dim_out: int = 512
    dim_emb: int = 512

    @nn.compact
    def __call__(self, x, x_lengths, train: bool = False, deterministic: bool = True):
        emb_tbl = Embed(self.alphabet_size, self.dim_emb, name="emb")
        h = emb_tbl(x)
        # padding id 0 contributes nothing (torch padding_idx=0)
        h = h * (x != 0).astype(h.dtype)[..., None]

        y = h
        for i in range(3):
            y = Conv1d(self.dim_emb, 5, padding=2, use_bias=False, name=f"conv_{i}")(y)
            affine = i < 2  # third BN is affine=False in the reference
            y = BatchNorm(use_scale=affine, use_bias=affine, name=f"bn_{i}")(
                y, use_running_average=not train
            )
            y = isrlu(y)
        h = jnp.concatenate([y, h], axis=-1)
        h = Dropout(0.1)(h, deterministic)

        B = h.shape[0]
        h0 = self.param("rnn_h0", nn.initializers.zeros, (1, self.dim_out))
        c0 = self.param("rnn_c0", nn.initializers.zeros, (1, self.dim_out))
        ys, _ = BiLSTM(self.dim_out // 2, use_bias=False, name="rnn")(
            h, x_lengths, jnp.broadcast_to(h0, (B, self.dim_out)),
            jnp.broadcast_to(c0, (B, self.dim_out)),
        )
        return ys


# ---------------------------------------------------------------------------
# Decoder cells
# ---------------------------------------------------------------------------


class Taco1DecoderCell(nn.Module):
    """GRU attention RNN + Markov attention + residual GRU stack
    (decoder_cell.py:20-63)."""

    dim_ctx: int
    dim_mel: int
    r: int
    dim_pre: int = 128
    dim_att: int = 256
    num_layers: int = 2
    p_zoneout: float = 0.1

    @property
    def dim_output(self) -> int:
        return self.dim_att + self.dim_ctx

    def initial_state(self, batch_size: int, memory_size: int, dtype=jnp.float32):
        w0 = initial_att_weights(batch_size, memory_size, dtype)
        h_att = jnp.zeros((batch_size, self.dim_att), dtype)
        h_dec = tuple(
            jnp.zeros((batch_size, self.dim_output), dtype)
            for _ in range(self.num_layers)
        )
        return (w0, h_att, h_dec)

    @nn.compact
    def __call__(self, state, x, memory, mmask, deterministic: bool = True,
                 prenet_rng=None):
        w, h_att, h_dec = state
        x_pre = PreNet(self.dim_pre, p_dropout=0.5, always_dropout=True,
                       name="pre_net")(x.reshape(x.shape[0], -1), deterministic,
                                       rng=prenet_rng)
        ctx = jnp.einsum("bl,bld->bd", w, memory)
        h_att, _ = GRUCell(self.dim_att, p_zoneout=0.1, name="attention_rnn")(
            h_att, jnp.concatenate([ctx, x_pre], -1), deterministic
        )
        w = ContentMarkovAttention(self.dim_ctx, name="attention")(
            h_att, w, memory, mmask, deterministic
        )
        x_dec = jnp.concatenate([h_att, ctx], -1)
        new_h = []
        for i in range(self.num_layers):
            h_i, x_dec = ResGRUCell(self.dim_output, p_zoneout=self.p_zoneout,
                                    name=f"decoder_rnn_{i}")(h_dec[i], x_dec,
                                                             deterministic)
            new_h.append(h_i)
        return (w, h_att, tuple(new_h)), x_dec, ctx


class Taco2DecoderCell(nn.Module):
    """Two zoneout LSTMs with attention computed after the RNNs
    (decoder_cell.py:66-140)."""

    dim_ctx: int
    dim_mel: int
    r: int
    dim_rnn: Tuple[int, int] = (1024, 1024)
    dim_pre: int = 128
    dim_att: int = 128
    p_zoneout: float = 0.1

    @property
    def dim_output(self) -> int:
        return sum(self.dim_rnn) + self.dim_ctx

    def initial_state(self, batch_size: int, memory_size: int, dtype=jnp.float32):
        w0 = initial_att_weights(batch_size, memory_size, dtype)
        h_dec = tuple(
            (jnp.zeros((batch_size, d), dtype), jnp.zeros((batch_size, d), dtype))
            for d in self.dim_rnn
        )
        return (w0, h_dec)

    @nn.compact
    def __call__(self, state, x, memory, mmask, deterministic: bool = True,
                 prenet_rng=None):
        w, h_dec = state
        x_pre = PreNet(self.dim_pre, dim_hidden=128, p_dropout=0.5,
                       always_dropout=True, name="pre_net")(
            x.reshape(x.shape[0], -1), deterministic, rng=prenet_rng
        )
        ctx = jnp.einsum("bl,bld->bd", w, memory)
        x_dec = x_pre
        new_h = []
        for i, d in enumerate(self.dim_rnn):
            h_i, _ = LSTMZoneoutCell(d, p_zoneout=self.p_zoneout,
                                     name=f"decoder_rnn_{i}")(
                h_dec[i], jnp.concatenate([x_dec, ctx], -1), deterministic
            )
            new_h.append(h_i)
            x_dec = h_i[0]
        x_att = jnp.concatenate([new_h[0][0], new_h[1][0], jnp.zeros_like(ctx)], -1)
        w = StepwiseMonotonicAttention(self.dim_ctx, name="attention")(
            x_att, w, memory, mmask, deterministic
        )
        out = jnp.concatenate([new_h[0][0], new_h[1][0], jnp.zeros_like(ctx)], -1)
        return (w, tuple(new_h)), out, ctx


class Taco2ProdDecoderCell(nn.Module):
    """Attention-LSTM -> monotonic attention -> context -> decoder-LSTM (the
    config default, decoder_cell.py:143-195)."""

    dim_ctx: int
    dim_mel: int
    r: int
    dim_rnn: Tuple[int, int] = (1024, 1024)
    dim_pre: int = 256
    dim_att: int = 128
    p_zoneout: float = 0.1

    @property
    def dim_output(self) -> int:
        return self.dim_rnn[1] + self.dim_ctx

    def initial_state(self, batch_size: int, memory_size: int, dtype=jnp.float32):
        w0 = initial_att_weights(batch_size, memory_size, dtype)
        ctx0 = jnp.zeros((batch_size, self.dim_ctx), dtype)
        h_att = (
            jnp.zeros((batch_size, self.dim_rnn[0]), dtype),
            jnp.zeros((batch_size, self.dim_rnn[0]), dtype),
        )
        h_dec = (
            jnp.zeros((batch_size, self.dim_rnn[1]), dtype),
            jnp.zeros((batch_size, self.dim_rnn[1]), dtype),
        )
        return (w0, ctx0, (h_att, h_dec))

    @nn.compact
    def __call__(self, state, x, memory, mmask, deterministic: bool = True,
                 prenet_rng=None):
        w, ctx, (h_att, h_dec) = state
        x_pre = PreNet(self.dim_pre, dim_hidden=self.dim_pre, always_dropout=True,
                       name="pre_net")(x.reshape(x.shape[0], -1), deterministic,
                                       rng=prenet_rng)
        h_att, _ = LSTMZoneoutCell(self.dim_rnn[0], p_zoneout=self.p_zoneout,
                                   name="attention_rnn")(
            h_att, jnp.concatenate([x_pre, ctx], -1), deterministic
        )
        w = StepwiseMonotonicAttention(self.dim_ctx, name="attention")(
            h_att[0], w, memory, mmask, deterministic
        )
        ctx = jnp.einsum("bl,bld->bd", w, memory)
        h_dec, _ = LSTMZoneoutCell(self.dim_rnn[1], p_zoneout=self.p_zoneout,
                                   name="decoder_rnn")(
            h_dec, jnp.concatenate([h_att[0], ctx], -1), deterministic
        )
        out = jnp.concatenate([h_dec[0], ctx], -1)
        return (w, ctx, (h_att, h_dec)), out, ctx


CELL_CLASSES = {
    "tacotron1": Taco1DecoderCell,
    "tacotron2": Taco2DecoderCell,
    "tacotron2prod": Taco2ProdDecoderCell,
}


class Decoder(nn.Module):
    """Autoregressive r-frame-group decoder as one lax.scan (decoder.py:5-77)."""

    cell_type: str
    dim_ctx: int
    dim_mel: int
    r: int
    dim_rnn: Tuple[int, int] = (1024, 1024)
    dim_pre: int = 256
    dim_att: int = 128
    stop_threshold: float = -2.0

    def setup(self):
        cls = CELL_CLASSES[self.cell_type]
        if self.cell_type == "tacotron1":
            self.cell = cls(self.dim_ctx, self.dim_mel, self.r,
                            dim_pre=self.dim_pre, dim_att=self.dim_att)
        else:
            self.cell = cls(self.dim_ctx, self.dim_mel, self.r,
                            dim_rnn=tuple(self.dim_rnn), dim_pre=self.dim_pre,
                            dim_att=self.dim_att)
        self.fc_mel = Dense(self.r * self.dim_mel)
        self.fc_stop = Dense(self.r)
        # learned initial RNN states (reference: decoder_cell.py
        # initial_decoder_h/c ParameterLists, :92-97 and :160-162)
        if self.cell_type == "tacotron2":
            dims = tuple(self.dim_rnn)
        elif self.cell_type == "tacotron2prod":
            dims = (self.dim_rnn[0], self.dim_rnn[1])
        else:
            dims = ()
        self.init_h = [
            self.param(f"init_h_{i}", nn.initializers.zeros, (1, d))
            for i, d in enumerate(dims)
        ]
        self.init_c = [
            self.param(f"init_c_{i}", nn.initializers.zeros, (1, d))
            for i, d in enumerate(dims)
        ]

    def _initial_state(self, B: int, L: int, dtype):
        from torch_tts_tpu.ops.tacotron_attention import initial_att_weights

        w0 = initial_att_weights(B, L, dtype)
        bc = lambda p: jnp.broadcast_to(p.astype(dtype), (B, p.shape[1]))
        if self.cell_type == "tacotron2prod":
            ctx0 = jnp.zeros((B, self.dim_ctx), dtype)
            h_att = (bc(self.init_h[0]), bc(self.init_c[0]))
            h_dec = (bc(self.init_h[1]), bc(self.init_c[1]))
            return (w0, ctx0, (h_att, h_dec))
        if self.cell_type == "tacotron2":
            h_dec = tuple(
                (bc(self.init_h[i]), bc(self.init_c[i]))
                for i in range(len(self.dim_rnn))
            )
            return (w0, h_dec)
        return self.cell.initial_state(B, L, dtype)

    def _ar_step(self, carry, t_prev, use_teacher, is_first, dkey, memory,
                 mmask, deterministic):
        """One r-group AR step, shared by the monolithic scan and
        decode_chunk (identical code => identical numerics)."""
        state, y_prev = carry
        y_in = jnp.where(is_first, jnp.zeros_like(y_prev),
                         jnp.where(use_teacher, t_prev, y_prev))
        # cell consumes [B, 1, D_mel] (last frame of the previous group)
        state, out, ctx = self.cell(
            state, y_in[:, None, :], memory, mmask, deterministic,
            prenet_rng=dkey,
        )
        y_t = nn.leaky_relu(self.fc_mel(out), 0.01)  # [B, r*D_mel]
        s_t = self.fc_stop(out)  # [B, r]
        y_t = y_t.reshape(y_t.shape[0], self.r, self.dim_mel)
        w_t = state[0]
        return (state, y_t[:, -1]), (y_t, s_t, w_t)

    def _scan(self, carry, xs, memory, mmask, deterministic):
        scan = nn.scan(
            lambda mdl, c, inp: mdl._ar_step(c, *inp, memory, mmask,
                                             deterministic),
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True, "noise": True},
        )
        return scan(self, carry, xs)

    def _step_keys(self, base, ts):
        """Per-step prenet-dropout keys as a pure function of (key, global
        step index) — the property that makes a chunked decode reproduce the
        monolithic scan bit-for-bit."""
        return jax.vmap(lambda t: jax.random.fold_in(base, t))(ts)

    def init_carry(self, memory):
        """Fresh AR carry for decode_chunk (learned initial states)."""
        B, L, _ = memory.shape
        state0 = self._initial_state(B, L, memory.dtype)
        y0 = jnp.zeros((B, self.dim_mel), memory.dtype)
        return (state0, y0)

    def __call__(
        self,
        memory,
        mmask,
        x: Optional[jax.Array] = None,
        max_steps: int = 400,
        p_no_forcing: float = 0.1,
        deterministic: bool = True,
        dropout_key: Optional[jax.Array] = None,
    ):
        """memory: [B, L, D]; x: teacher mels [B, T, D_mel] (training) or None.

        Returns (y [B, S*r, D_mel], s [B, S*r, 1], w [B, S, L], stop_lengths
        [B] in frame groups).
        """
        B, L, _ = memory.shape
        teacher = x is not None
        if teacher:
            S = x.shape[1] // self.r
            # last frame of each r-group, shifted: input for step t is group t-1
            groups = x[:, : S * self.r].reshape(B, S, self.r, self.dim_mel)
            last_frames = groups[:, :, -1]  # [B, S, D_mel]
            teacher_prev = jnp.concatenate(
                [jnp.zeros((B, 1, self.dim_mel), x.dtype), last_frames[:, :-1]], 1
            )
        else:
            S = max_steps
            teacher_prev = jnp.zeros((B, S, self.dim_mel), memory.dtype)

        if teacher and not deterministic and p_no_forcing:
            coin = (
                jax.random.uniform(self.make_rng("noise"), (S,)) > p_no_forcing
            )
        else:
            coin = jnp.ones((S,), bool) if teacher else jnp.zeros((S,), bool)

        base = (dropout_key if dropout_key is not None
                else self.make_rng("dropout"))
        dkeys = self._step_keys(base, jnp.arange(S))
        is_first = jnp.zeros((S,), bool).at[0].set(True)
        carry0 = self.init_carry(memory)
        (state, _), (ys, ss, ws) = self._scan(
            carry0, (teacher_prev.transpose(1, 0, 2), coin, is_first, dkeys),
            memory, mmask, deterministic,
        )
        # scan stacks on axis 0: ys [S, B, r, D_mel] -> [B, S*r, D_mel]
        y = ys.transpose(1, 0, 2, 3).reshape(B, S * self.r, self.dim_mel)
        s = ss.transpose(1, 0, 2).reshape(B, S * self.r, 1)
        w = ws.transpose(1, 0, 2)  # [B, S, L]

        # per-item stop step: first group whose min stop logit < threshold
        s_groups = ss.transpose(1, 0, 2)  # [B, S, r]
        stopped = jnp.min(s_groups, axis=-1) < self.stop_threshold
        any_stop = jnp.any(stopped, axis=1)
        first_stop = jnp.argmax(stopped, axis=1) + 1
        stop_lengths = jnp.where(any_stop, first_stop, S)
        return y, s, w, stop_lengths

    def decode_chunk(
        self,
        memory,
        mmask,
        carry,
        t0,
        dropout_key,
        chunk_steps: int,
        deterministic: bool = True,
    ):
        """Continue the free-running AR decode for `chunk_steps` groups from
        global step t0 with the given carry (from init_carry or a previous
        chunk). Same per-step keys as the monolithic scan, so concatenated
        chunks equal the monolithic inference decode bit-for-bit.

        Returns (carry, y [B, K*r, D_mel], stopped [B, K] per-group stop
        flags, w [B, K, L])."""
        B = memory.shape[0]
        ts = t0 + jnp.arange(chunk_steps)
        dkeys = self._step_keys(dropout_key, ts)
        xs = (
            jnp.zeros((chunk_steps, B, self.dim_mel), memory.dtype),
            jnp.zeros((chunk_steps,), bool),
            ts == 0,
            dkeys,
        )
        carry, (ys, ss, ws) = self._scan(carry, xs, memory, mmask,
                                         deterministic)
        y = ys.transpose(1, 0, 2, 3).reshape(B, chunk_steps * self.r,
                                             self.dim_mel)
        s_groups = ss.transpose(1, 0, 2)  # [B, K, r]
        stopped = jnp.min(s_groups, axis=-1) < self.stop_threshold
        return carry, y, stopped, ws.transpose(1, 0, 2)


class Tacotron(nn.Module):
    """Assembly: encoder + (optional style ref-encoder) + decoder + postnet
    (tacotron.py:20-56)."""

    cfg: TacotronConfig
    alphabet_size: int

    def setup(self):
        m = self.cfg.model
        a = self.cfg.audio
        if m.encoder_type == "tacotron1":
            self.encoder = Encoder(self.alphabet_size, m.dim_out, m.dim_emb)
        else:
            self.encoder = Encoder2(self.alphabet_size, m.dim_out, m.dim_emb)
        self.decoder = Decoder(
            cell_type={"tacotron1": "tacotron1", "tacotron2": "tacotron2"}.get(
                m.decoder_type, "tacotron2prod"
            ),
            dim_ctx=m.dim_out,
            dim_mel=a.num_mels,
            r=m.r,
            dim_rnn=tuple(m.dim_rnn),
            dim_pre=m.dim_pre,
            dim_att=m.dim_att,
        )
        if m.postnet_type == "tacotron2":
            self.postnet = MelPostnet(
                a.num_mels, dim_hidden=m.postnet_dim_hidden,
                num_layers=m.postnet_num_layers,
            )
        elif m.postnet_type is not None:
            self.postnet = MelPostnet2(
                a.num_mels, dim_hidden=m.postnet_dim_hidden,
                num_layers=m.postnet_num_layers,
            )
        else:
            self.postnet = None
        if m.style_dim_vae:
            # dim_emb follows the encoder width so the style embedding can be
            # added to memory (the reference's default dims would not broadcast)
            self.refencoder = VAE(dim_emb=m.dim_out, dim_vae=m.style_dim_vae)
        else:
            self.refencoder = None

    def __call__(
        self,
        cond,
        cond_lengths,
        x: Optional[jax.Array] = None,
        x_lengths: Optional[jax.Array] = None,
        xref: Optional[jax.Array] = None,
        xref_lengths: Optional[jax.Array] = None,
        max_steps: int = 400,
        train: bool = False,
        deterministic: bool = True,
        dropout_key: Optional[jax.Array] = None,
    ):
        memory = self.encoder(cond, cond_lengths, train=train,
                              deterministic=deterministic)
        kl_loss = jnp.zeros(())
        if xref is not None and self.refencoder is not None:
            style, style_losses = self.refencoder(
                xref, xref_lengths, train=train, deterministic=deterministic
            )
            memory = memory + style
            if "kl" in style_losses:
                kl_loss = jnp.mean(style_losses["kl"])

        mmask = sequence_mask(cond_lengths, memory.shape[1])
        y, s, w, stop_lengths = self.decoder(
            memory, mmask, x=x, max_steps=max_steps, p_no_forcing=0.1,
            deterministic=deterministic, dropout_key=dropout_key,
        )
        y_post = (
            self.postnet(y, train=train, deterministic=deterministic)
            if self.postnet is not None
            else y
        )
        return y, y_post, s, {"w": w, "kl_loss": kl_loss,
                              "stop_lengths": stop_lengths}

    # -- streaming surface (no reference counterpart; infer/taco_serving
    #    drives these as separate jitted programs for chunked low-TTFA
    #    synthesis) ----------------------------------------------------------

    def encode(self, cond, cond_lengths, xref=None, xref_lengths=None):
        """Text -> (memory [B, L, D], mmask [B, L]) — the once-per-utterance
        prefix of inference."""
        memory = self.encoder(cond, cond_lengths, train=False,
                              deterministic=True)
        if xref is not None and self.refencoder is not None:
            style, _ = self.refencoder(xref, xref_lengths, train=False,
                                       deterministic=True)
            memory = memory + style
        mmask = sequence_mask(cond_lengths, memory.shape[1])
        return memory, mmask

    def decode_init(self, memory):
        return self.decoder.init_carry(memory)

    def decode_chunk(self, memory, mmask, carry, t0, dropout_key,
                     chunk_steps: int):
        return self.decoder.decode_chunk(
            memory, mmask, carry, t0, dropout_key, chunk_steps,
            deterministic=True,
        )

    def apply_postnet(self, y):
        """Postnet over an arbitrary frame window (streaming emission)."""
        if self.postnet is None:
            return y
        return self.postnet(y, train=False, deterministic=True)


def build_tacotron(cfg: TacotronConfig) -> Tacotron:
    """Config -> model (tacotron.py:165-224). Alphabet size = 1 + |alphabet|."""
    alphabet_size = 1 + len(cfg.text.alphabet)
    return Tacotron(cfg=cfg, alphabet_size=alphabet_size)
