"""Coverage for less-traveled module paths: the Tacotron-1 CBHG encoder,
GST style encoder, Taco1PostNet, MelPostnet2, Upsampler, duration
discriminator V2, and the standalone autoencoders."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_tts_tpu.core.config import (
    TacotronAudioConfig,
    TacotronConfig,
    TacotronModelConfig,
    TacotronTextConfig,
)


def test_tacotron1_encoder_path(rng):
    """Full model with the CBHG encoder (encoder_type=tacotron1)."""
    from torch_tts_tpu.models.tacotron import build_tacotron

    cfg = TacotronConfig(
        audio=TacotronAudioConfig(num_mels=20),
        text=TacotronTextConfig(alphabet="abcdefghij "),
        model=TacotronModelConfig(
            encoder_type="tacotron1", dim_emb=16, dim_out=16,
            decoder_type="tacotron2prod", r=2, dim_pre=8, dim_att=8,
            dim_rnn=(16, 16), postnet_type=None,
        ),
    )
    model = build_tacotron(cfg)
    B, L, T = 2, 7, 8
    cond = jnp.asarray(rng.integers(1, model.alphabet_size, (B, L)))
    cl = jnp.asarray([L, L - 2])
    x = jnp.asarray(rng.standard_normal((B, T, 20)).astype(np.float32))
    xl = jnp.asarray([T, T])
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, cond, cl, x, xl, train=True, deterministic=False)
    out, _ = model.apply(
        variables, cond, cl, x, xl, train=True, deterministic=False,
        mutable=["batch_stats"],
        rngs={"noise": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
    )
    y, y_post, s, aux = out
    assert y.shape == (B, T, 20)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_post))  # no postnet


def test_gst_and_stl(rng):
    from torch_tts_tpu.ops.style import GST

    B, T, M = 2, 40, 20
    mels = jnp.asarray(rng.standard_normal((B, T, M)).astype(np.float32))
    gst = GST(dim_emb=16, dim_enc=8, num_tokens=5, num_heads=4)
    variables = gst.init(jax.random.PRNGKey(0), mels)
    style, losses = gst.apply(variables, mels)
    assert style.shape == (B, 1, 16)
    assert losses == {}


def test_taco1_postnet_and_melpostnet2_and_upsampler(rng):
    from torch_tts_tpu.ops.tacotron_blocks import MelPostnet2, Taco1PostNet, Upsampler

    B, T, M = 2, 12, 20
    x = jnp.asarray(rng.standard_normal((B, T, M)).astype(np.float32))

    p1 = Taco1PostNet(dim_stft=33)
    v1 = p1.init(jax.random.PRNGKey(0), x)
    y1 = p1.apply(v1, x)
    assert y1.shape == (B, T, 33)

    p2 = MelPostnet2(dim_in=M, dim_hidden=16, num_layers=2)
    v2 = p2.init({"params": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(1)}, x)
    y2 = p2.apply(v2, x, rngs={"dropout": jax.random.PRNGKey(2)})
    assert y2.shape == (B, T, M)

    up = Upsampler()
    vu = up.init(jax.random.PRNGKey(0), x)
    yu = up.apply(vu, x)
    assert yu.shape == (B, 2 * T, M)


def test_duration_discriminator_v2(rng):
    from torch_tts_tpu.models.vits2 import DurationDiscriminatorV2

    B, T, H = 2, 9, 16
    hx = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))
    mask = jnp.ones((B, T, 1))
    dur_r = jnp.abs(jnp.asarray(rng.standard_normal((B, T, 1)).astype(np.float32)))
    dur_g = jnp.abs(jnp.asarray(rng.standard_normal((B, T, 1)).astype(np.float32)))
    dd = DurationDiscriminatorV2(H)
    variables = dd.init(jax.random.PRNGKey(0), hx, mask, dur_r, dur_g)
    probs = dd.apply(variables, hx, mask, dur_r, dur_g)
    assert len(probs) == 2
    for p in probs:
        assert p.shape == (B, T, 1)
        assert float(p.min()) >= 0.0 and float(p.max()) <= 1.0


def test_autoencoders(rng):
    from torch_tts_tpu.ops.autoencoder import Autoencoder, VAEBottleneck

    x = jnp.asarray(rng.standard_normal((4, 10)).astype(np.float32))
    ae = Autoencoder(dim_bottleneck=3)
    v = ae.init(jax.random.PRNGKey(0), x)
    out, z = ae.apply(v, x)
    assert out.shape == x.shape and z.shape == (4, 3)

    vae = VAEBottleneck(dim_bottleneck=3)
    v = vae.init({"params": jax.random.PRNGKey(0),
                  "noise": jax.random.PRNGKey(1)}, x, deterministic=False)
    out, aux = vae.apply(v, x, deterministic=False,
                         rngs={"noise": jax.random.PRNGKey(2)})
    assert out.shape == x.shape
    assert aux["kl"].shape == (4, 3)
    assert float(aux["kl"].min()) >= 0.0
