"""Recurrent cells and sequence RNNs (tacotron stack).

Equivalents of /root/reference/tacotron/modules/rnn.py and the GRU cell in
mps_fixes (GRUCellFixed, :32-56), built for `lax.scan`:

- cells are pure (params, carry, x) -> (carry, y) functions wrapped in
  flax modules (torch gate order kept: LSTM i,f,g,o / GRU r,z,n — so a
  converter can copy torch weights in directly);
- zoneout matches the reference's asymmetric behavior (rnn.py:19-39): random
  carry-hold during training, deterministic EMA blend at eval;
- BiLSTM runs forward and length-aware-reversed scans and concatenates —
  the packed-sequence machinery is replaced by masks.

RNNs are inherently sequential; on TPU the scan body is a handful of
[B, 4H] matmuls that ride the MXU. The per-step attention+RNN fusion for the
tacotron decoder lives in the decoder scan (models/tacotron/model.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from torch_tts_tpu.ops.layers import torch_uniform_init


class LSTMCell(nn.Module):
    """torch.nn.LSTMCell-compatible cell. Carry: (h, c)."""

    hidden_size: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, carry, x):
        h, c = carry
        H = self.hidden_size
        in_f = x.shape[-1]
        init = torch_uniform_init(H)
        w_ih = self.param("w_ih", init, (in_f, 4 * H))
        w_hh = self.param("w_hh", init, (H, 4 * H))
        gates = x @ w_ih + h @ w_hh
        if self.use_bias:
            b_ih = self.param("b_ih", init, (4 * H,))
            b_hh = self.param("b_hh", init, (4 * H,))
            gates = gates + b_ih + b_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new


class LSTMZoneoutCell(nn.Module):
    """LSTM cell with zoneout regularization (rnn.py:19-39)."""

    hidden_size: int
    p_zoneout: float = 0.1
    use_bias: bool = True

    @nn.compact
    def __call__(self, carry, x, deterministic: bool = True):
        (h_new, c_new), _ = LSTMCell(self.hidden_size, self.use_bias, name="cell")(
            carry, x
        )
        h_prev, c_prev = carry
        p = self.p_zoneout
        if p:
            if not deterministic:
                kh, kc = jax.random.split(self.make_rng("dropout"))
                mh = jax.random.uniform(kh, (self.hidden_size,)) < p
                mc = jax.random.uniform(kc, (self.hidden_size,)) < p
                h_new = jnp.where(mh, h_prev, h_new)
                c_new = jnp.where(mc, c_prev, c_new)
            else:
                h_new = p * h_prev + (1.0 - p) * h_new
                c_new = p * c_prev + (1.0 - p) * c_new
        return (h_new, c_new), h_new


class GRUCell(nn.Module):
    """torch.nn.GRUCell-compatible (gate order r,z,n) with optional zoneout
    (mps_fixes.py GRUCellFixed:32-56). Carry: h."""

    hidden_size: int
    p_zoneout: Optional[float] = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, h, x, deterministic: bool = True):
        H = self.hidden_size
        init = torch_uniform_init(H)
        w_ih = self.param("w_ih", init, (x.shape[-1], 3 * H))
        w_hh = self.param("w_hh", init, (H, 3 * H))
        gi = x @ w_ih
        gh = h @ w_hh
        if self.use_bias:
            b_ih = self.param("b_ih", init, (3 * H,))
            b_hh = self.param("b_hh", init, (3 * H,))
            gi = gi + b_ih
            gh = gh + b_hh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * h
        if self.p_zoneout:
            if not deterministic:
                m = (
                    jax.random.uniform(self.make_rng("dropout"), (H,))
                    < self.p_zoneout
                )
                h_new = jnp.where(m, h, h_new)
            else:
                h_new = self.p_zoneout * h + (1.0 - self.p_zoneout) * h_new
        return h_new, h_new


class ResGRUCell(nn.Module):
    """GRU cell with residual output (rnn.py:10 / mps_fixes.py:58)."""

    hidden_size: int
    p_zoneout: Optional[float] = None

    @nn.compact
    def __call__(self, h, x, deterministic: bool = True):
        h_new, _ = GRUCell(self.hidden_size, self.p_zoneout, name="gru")(
            h, x, deterministic
        )
        return h_new, x + h_new


def reverse_padded(x: jax.Array, lengths: jax.Array) -> jax.Array:
    """Reverse each sequence within its valid length (rnn.py:5); padding stays
    at the tail."""
    T = x.shape[1]
    pos = jnp.arange(T)
    idx = lengths[:, None] - 1 - pos[None, :]
    idx = jnp.where(idx >= 0, idx, pos[None, :])  # padding maps to itself
    return jnp.take_along_axis(x, idx[..., None], axis=1)


class UnidirLSTM(nn.Module):
    """Run an LSTM over [B, T, C] via lax.scan. Returns (ys, (h_n, c_n))."""

    hidden_size: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, h0, c0):
        ScanCell = nn.scan(
            LSTMCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        (h_n, c_n), ys = ScanCell(self.hidden_size, self.use_bias, name="cell")(
            (h0, c0), x
        )
        return ys, (h_n, c_n)


class BiLSTM(nn.Module):
    """Bidirectional LSTM with learned/supplied initial state (rnn.py:112-127).

    h0/c0: [B, 2*hidden] (forward ++ backward halves). Output [B, T, 2*hidden],
    masked to zero past each length.
    """

    hidden_size: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, lengths, h0, c0):
        H = self.hidden_size
        f_h0, b_h0 = h0[..., :H], h0[..., H:]
        f_c0, b_c0 = c0[..., :H], c0[..., H:]
        ys_f, (h_f, _) = UnidirLSTM(H, self.use_bias, name="fwd")(x, f_h0, f_c0)
        x_rev = reverse_padded(x, lengths)
        ys_b, (h_b, _) = UnidirLSTM(H, self.use_bias, name="bwd")(x_rev, b_h0, b_c0)
        ys_b = reverse_padded(ys_b, lengths)
        ys = jnp.concatenate([ys_f, ys_b], axis=-1)
        mask = (jnp.arange(x.shape[1])[None, :] < lengths[:, None]).astype(ys.dtype)
        ys = ys * mask[..., None]
        return ys, jnp.concatenate([h_f, h_b], axis=-1)
