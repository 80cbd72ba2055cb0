"""Tacotron stack: RNN cell parity vs torch, encoder/decoder shapes,
teacher-forced training forward + loss, and free-running inference."""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from torch_tts_tpu.core.config import (
    TacotronAudioConfig,
    TacotronConfig,
    TacotronModelConfig,
    TacotronTextConfig,
)
from torch_tts_tpu.models.tacotron import build_tacotron
from torch_tts_tpu.models.tacotron.losses import tacotron_loss
from torch_tts_tpu.ops import rnn as R
from torch_tts_tpu.ops.tacotron_attention import (
    ContentMarkovAttention,
    StepwiseMonotonicAttention,
    initial_att_weights,
)

TINY = TacotronConfig(
    audio=TacotronAudioConfig(num_mels=20),
    text=TacotronTextConfig(alphabet="abcdefghij "),
    model=TacotronModelConfig(
        dim_emb=16, dim_out=16, r=2, dim_pre=8, dim_att=8, dim_rnn=(16, 16),
        postnet_dim_hidden=16, postnet_num_layers=2,
    ),
)


def test_lstm_cell_matches_torch(rng):
    B, I, H = 3, 5, 7
    x = rng.standard_normal((B, I)).astype(np.float32)
    h = rng.standard_normal((B, H)).astype(np.float32)
    c = rng.standard_normal((B, H)).astype(np.float32)
    t_cell = torch.nn.LSTMCell(I, H)
    with torch.no_grad():
        th, tc = t_cell(torch.from_numpy(x), (torch.from_numpy(h), torch.from_numpy(c)))

    cell = R.LSTMCell(H)
    params = {
        "w_ih": jnp.asarray(t_cell.weight_ih.detach().numpy().T),
        "w_hh": jnp.asarray(t_cell.weight_hh.detach().numpy().T),
        "b_ih": jnp.asarray(t_cell.bias_ih.detach().numpy()),
        "b_hh": jnp.asarray(t_cell.bias_hh.detach().numpy()),
    }
    (jh, jc), _ = cell.apply({"params": params}, (jnp.asarray(h), jnp.asarray(c)),
                             jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jh), th.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jc), tc.numpy(), rtol=1e-4, atol=1e-5)


def test_gru_cell_matches_torch(rng):
    B, I, H = 3, 5, 7
    x = rng.standard_normal((B, I)).astype(np.float32)
    h = rng.standard_normal((B, H)).astype(np.float32)
    t_cell = torch.nn.GRUCell(I, H)
    with torch.no_grad():
        th = t_cell(torch.from_numpy(x), torch.from_numpy(h))
    cell = R.GRUCell(H)
    params = {
        "w_ih": jnp.asarray(t_cell.weight_ih.detach().numpy().T),
        "w_hh": jnp.asarray(t_cell.weight_hh.detach().numpy().T),
        "b_ih": jnp.asarray(t_cell.bias_ih.detach().numpy()),
        "b_hh": jnp.asarray(t_cell.bias_hh.detach().numpy()),
    }
    jh, _ = cell.apply({"params": params}, jnp.asarray(h), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jh), th.numpy(), rtol=1e-4, atol=1e-5)


def test_bilstm_matches_torch_on_ragged(rng):
    B, T, I, H = 2, 9, 4, 6
    x = rng.standard_normal((B, T, I)).astype(np.float32)
    lengths = np.array([9, 5])
    t_rnn = torch.nn.LSTM(I, H, batch_first=True, bidirectional=True)
    xt = torch.from_numpy(x)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        xt, torch.tensor(lengths), batch_first=True, enforce_sorted=False
    )
    with torch.no_grad():
        out, _ = t_rnn(packed)
    ref, _ = torch.nn.utils.rnn.pad_packed_sequence(out, batch_first=True, total_length=T)
    ref = ref.numpy()

    mod = R.BiLSTM(H)
    params = {
        "fwd": {"cell": {
            "w_ih": jnp.asarray(t_rnn.weight_ih_l0.detach().numpy().T),
            "w_hh": jnp.asarray(t_rnn.weight_hh_l0.detach().numpy().T),
            "b_ih": jnp.asarray(t_rnn.bias_ih_l0.detach().numpy()),
            "b_hh": jnp.asarray(t_rnn.bias_hh_l0.detach().numpy()),
        }},
        "bwd": {"cell": {
            "w_ih": jnp.asarray(t_rnn.weight_ih_l0_reverse.detach().numpy().T),
            "w_hh": jnp.asarray(t_rnn.weight_hh_l0_reverse.detach().numpy().T),
            "b_ih": jnp.asarray(t_rnn.bias_ih_l0_reverse.detach().numpy()),
            "b_hh": jnp.asarray(t_rnn.bias_hh_l0_reverse.detach().numpy()),
        }},
    }
    h0 = jnp.zeros((B, 2 * H))
    c0 = jnp.zeros((B, 2 * H))
    ys, _ = mod.apply({"params": params}, jnp.asarray(x), jnp.asarray(lengths), h0, c0)
    np.testing.assert_allclose(np.asarray(ys), ref, rtol=1e-4, atol=1e-5)


def test_attention_weight_conservation(rng):
    """Both monotonic attentions propagate probability mass: weights stay
    normalized (sum == 1) when inputs are normalized."""
    B, L, D = 3, 12, 8
    memory = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
    w0 = initial_att_weights(B, L)
    x = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))

    att = StepwiseMonotonicAttention(D)
    p = att.init(jax.random.PRNGKey(0), x, w0, memory)
    w1 = att.apply(p, x, w0, memory)
    np.testing.assert_allclose(np.asarray(w1.sum(axis=1)), np.ones(B), rtol=1e-5)
    assert np.all(np.asarray(w1) >= 0)

    att2 = ContentMarkovAttention(D)
    p2 = att2.init(jax.random.PRNGKey(0), x, w0, memory)
    w2 = att2.apply(p2, x, w0, memory)
    np.testing.assert_allclose(np.asarray(w2.sum(axis=1)), np.ones(B), rtol=1e-5)


@pytest.mark.parametrize("decoder_type", ["tacotron2prod", "tacotron2", "tacotron1"])
def test_tacotron_training_forward(rng, decoder_type):
    cfg = dataclasses.replace(
        TINY, model=dataclasses.replace(TINY.model, decoder_type=decoder_type)
    )
    model = build_tacotron(cfg)
    B, L, T = 2, 7, 12  # T divisible by r=2
    cond = jnp.asarray(rng.integers(1, model.alphabet_size, (B, L)))
    cond_lengths = jnp.asarray([L, L - 2])
    x = jnp.asarray(rng.standard_normal((B, T, 20)).astype(np.float32))
    x_lengths = jnp.asarray([T, T - 4])

    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, cond, cond_lengths, x, x_lengths, train=True,
                           deterministic=False)
    out, mutated = model.apply(
        variables, cond, cond_lengths, x, x_lengths, train=True,
        deterministic=False, mutable=["batch_stats"],
        rngs={"noise": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
    )
    y, y_post, s, aux = out
    assert y.shape == (B, T, 20)
    assert y_post.shape == (B, T, 20)
    assert s.shape == (B, T, 1)
    assert aux["w"].shape == (B, T // 2, L)

    xmask = np.arange(T)[None] < np.asarray(x_lengths)[:, None]
    loss, metrics = tacotron_loss(y, y_post, s, x, jnp.asarray(xmask), aux["w"],
                                  aux["kl_loss"])
    assert np.isfinite(float(loss))


def test_tacotron_inference(rng):
    model = build_tacotron(TINY)
    B, L = 2, 7
    cond = jnp.asarray(rng.integers(1, model.alphabet_size, (B, L)))
    cond_lengths = jnp.asarray([L, L - 2])
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    x_dummy = jnp.asarray(rng.standard_normal((B, 8, 20)).astype(np.float32))
    variables = model.init(rngs, cond, cond_lengths, x_dummy, train=True,
                           deterministic=False)

    MAX_STEPS = 10
    y, y_post, s, aux = model.apply(
        variables, cond, cond_lengths, max_steps=MAX_STEPS,
        rngs={"dropout": jax.random.PRNGKey(5)},
    )
    assert y.shape == (B, MAX_STEPS * 2, 20)
    assert aux["stop_lengths"].shape == (B,)
    assert np.all(np.asarray(aux["stop_lengths"]) <= MAX_STEPS)


def test_tacotron_with_vae_style(rng):
    cfg = dataclasses.replace(
        TINY, model=dataclasses.replace(TINY.model, style_dim_vae=4)
    )
    model = build_tacotron(cfg)
    B, L, T = 2, 7, 12
    cond = jnp.asarray(rng.integers(1, model.alphabet_size, (B, L)))
    cond_lengths = jnp.asarray([L, L])
    x = jnp.asarray(rng.standard_normal((B, T, 20)).astype(np.float32))
    x_lengths = jnp.asarray([T, T])
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, cond, cond_lengths, x, x_lengths, xref=x,
                           xref_lengths=x_lengths, train=True, deterministic=False)
    out, _ = model.apply(
        variables, cond, cond_lengths, x, x_lengths, xref=x, xref_lengths=x_lengths,
        train=True, deterministic=False, mutable=["batch_stats"],
        rngs={"noise": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
    )
    y, y_post, s, aux = out
    assert float(jnp.sum(jnp.abs(aux["kl_loss"]))) >= 0
