"""Tacotron parity against the actual PyTorch reference
(/root/reference/tacotron, imported read-only).

Stochastic pieces are neutralized identically on both sides (the PreNet's
always-on dropout and the teacher-forcing coin are patched out; zoneout uses
its deterministic eval blending in both), then:
- Encoder2 forward parity on ragged batches,
- full teacher-forced forward parity: mel, postnet mel, stop logits, and
  attention weights.
"""

import sys
import types
import unittest.mock as mock

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
from torch_tts_tpu.models.tacotron.convert import export_torch_state_dict

REF = "/root/reference/tacotron"

CFG = TacotronConfig(
    audio=TacotronAudioConfig(num_mels=10),
    text=TacotronTextConfig(alphabet="abcdefghij "),
    model=TacotronModelConfig(
        dim_emb=16, dim_out=16, decoder_type="tacotron2prod", r=2,
        dim_pre=8, dim_att=8, dim_rnn=(12, 12),
        postnet_type="tacotron2", postnet_dim_hidden=16, postnet_num_layers=2,
    ),
)


@pytest.fixture(scope="module")
def ref_taco():
    """Import the reference tacotron package (flat imports, torch-only)."""
    # the vits2 parity tests may have loaded same-named flat modules
    saved = {}
    for name in list(sys.modules):
        if name in ("models", "modules", "commons", "attentions", "transforms",
                    "data", "text", "encoder", "decoder", "decoder_cell",
                    "tacotron", "mps_fixes") or name.startswith(
                        ("modules.", "data.", "mps_fixes.")):
            saved[name] = sys.modules.pop(name)
    sys.path.insert(0, REF)
    import tacotron as ref_tacotron_mod

    yield ref_tacotron_mod
    sys.path.remove(REF)
    for name in list(sys.modules):
        if name in ("tacotron", "encoder", "decoder", "decoder_cell", "modules",
                    "data", "mps_fixes") or name.startswith(
                        ("modules.", "data.", "mps_fixes.")):
            sys.modules.pop(name, None)
    sys.modules.update(saved)


def ref_config_dict(cfg: TacotronConfig):
    m = cfg.model
    return {
        "text": {"alphabet": cfg.text.alphabet},
        "audio": {"num_mels": cfg.audio.num_mels},
        "model": {
            "encoder": {"type": "tacotron2", "dim_emb": m.dim_emb,
                        "dim_out": m.dim_out},
            "decoder": {"type": "tacotron2prod", "r": m.r, "dim_pre": m.dim_pre,
                        "dim_att": m.dim_att, "dim_rnn": list(m.dim_rnn)},
            "postnet": {"type": "tacotron2", "dim_hidden": m.postnet_dim_hidden,
                        "num_layers": m.postnet_num_layers},
        },
    }


def build_pair(ref_taco, rng):
    ours = build_tacotron(CFG)
    B, L, T = 2, 7, 8
    cond = jnp.asarray(rng.integers(1, ours.alphabet_size, (B, L)))
    cond_lengths = jnp.asarray([L, L - 2])
    x = jnp.asarray(rng.standard_normal((B, T, 10)).astype(np.float32))
    x_lengths = jnp.asarray([T, T - 2])
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = ours.init(rngs, cond, cond_lengths, x, x_lengths, train=True,
                          deterministic=False)
    params = jax.device_get(variables["params"])
    batch_stats = jax.device_get(variables.get("batch_stats", {}))

    sd = export_torch_state_dict(params, batch_stats, CFG)
    ref = ref_taco.build_tacotron(ref_config_dict(CFG))
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert not missing, f"missing: {missing[:8]}"
    assert not unexpected, f"unexpected: {unexpected[:8]}"
    ref.eval()
    inputs = (cond, cond_lengths, x, x_lengths)
    return ours, {"params": params, "batch_stats": batch_stats}, ref, inputs


def test_converter_covers_reference(ref_taco, rng):
    build_pair(ref_taco, rng)


def test_encoder2_forward_parity(ref_taco, rng):
    ours, variables, ref, (cond, cond_lengths, x, x_lengths) = build_pair(ref_taco, rng)
    memory = ours.apply(
        variables, cond, cond_lengths, train=False, deterministic=True,
        method=lambda m, c, cl, train, deterministic: m.encoder(
            c, cl, train=train, deterministic=deterministic
        ),
    )
    with torch.no_grad():
        memory_t = ref.encoder(
            torch.from_numpy(np.asarray(cond)).long(),
            torch.from_numpy(np.asarray(cond_lengths)).long(),
        )
    np.testing.assert_allclose(
        np.asarray(memory), memory_t.numpy(), rtol=1e-4, atol=1e-5
    )


def _no_dropout_ours():
    from torch_tts_tpu.ops import layers

    return mock.patch.object(
        layers.Dropout, "__call__",
        lambda self, x, deterministic=True, rng=None: x
    )


def test_full_teacher_forced_parity(ref_taco, rng):
    ours, variables, ref, (cond, cond_lengths, x, x_lengths) = build_pair(ref_taco, rng)

    with _no_dropout_ours():
        y, y_post, s, aux = ours.apply(
            variables, cond, cond_lengths, x, x_lengths,
            train=False, deterministic=True,
            rngs={"dropout": jax.random.PRNGKey(0),
                  "noise": jax.random.PRNGKey(1)},
        )

    real_dropout = torch.dropout
    with torch.no_grad(), \
         mock.patch.object(torch, "dropout", lambda x, p, train: x), \
         mock.patch.object(torch, "rand", lambda *a, **k: torch.ones(*a)):
        y_t, y_post_t, s_t, aux_t = ref(
            torch.from_numpy(np.asarray(cond)).long(),
            torch.from_numpy(np.asarray(cond_lengths)).long(),
            torch.from_numpy(np.asarray(x)),
            torch.from_numpy(np.asarray(x_lengths)).long(),
        )
    torch.dropout = real_dropout

    np.testing.assert_allclose(np.asarray(y), y_t.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(y_post), y_post_t.numpy(), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(s)[..., 0],
        s_t.numpy().reshape(s_t.shape[0], -1),
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(aux["w"]), aux_t["w"].numpy(), rtol=1e-3, atol=1e-4
    )


def test_free_running_inference_parity(ref_taco, rng):
    """Free-running decode parity (stop logits drive both loops; dropout
    patched out on both sides so the AR rollout is deterministic)."""
    ours, variables, ref, (cond, cond_lengths, x, x_lengths) = build_pair(ref_taco, rng)
    MAX_STEPS = 6

    with _no_dropout_ours():
        y, y_post, s, aux = ours.apply(
            variables, cond, cond_lengths, max_steps=MAX_STEPS,
            train=False, deterministic=True,
            rngs={"dropout": jax.random.PRNGKey(0),
                  "noise": jax.random.PRNGKey(1)},
        )

    real_dropout = torch.dropout
    with torch.no_grad(), \
         mock.patch.object(torch, "dropout", lambda x_, p, train: x_):
        y_t, y_post_t, s_t, aux_t = ref(
            torch.from_numpy(np.asarray(cond)).long(),
            torch.from_numpy(np.asarray(cond_lengths)).long(),
            max_steps=MAX_STEPS,
        )
    torch.dropout = real_dropout

    # the reference stops when any item crosses the threshold; with random
    # weights that's usually never before max_steps — compare the overlap
    T_ref = y_t.shape[1]
    T_cmp = min(T_ref, y.shape[1])
    np.testing.assert_allclose(
        np.asarray(y)[:, :T_cmp], y_t.numpy()[:, :T_cmp], rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(aux["w"])[:, : T_cmp // 2],
        aux_t["w"].numpy()[:, : T_cmp // 2],
        rtol=1e-3, atol=1e-4,
    )
