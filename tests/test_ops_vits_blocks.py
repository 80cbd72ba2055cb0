"""Property tests for the VITS2 op library: spline/flow invertibility,
logdet consistency (checked against autodiff jacobians), masking invariance,
and shape contracts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_tts_tpu.ops import splines
from torch_tts_tpu.ops.flows import ConvFlow, ElementwiseAffine, Flip, Log, ResidualCouplingLayer
from torch_tts_tpu.ops.hifigan import Generator
from torch_tts_tpu.ops.transformer import Encoder, FFN, MultiHeadAttention
from torch_tts_tpu.ops.wavenet import WN


def test_spline_roundtrip_and_logdet(rng):
    B, T, C, K = 2, 5, 3, 10
    x = jnp.asarray(rng.uniform(-8, 8, (B, T, C)).astype(np.float32))
    uw = jnp.asarray(rng.standard_normal((B, T, C, K)).astype(np.float32))
    uh = jnp.asarray(rng.standard_normal((B, T, C, K)).astype(np.float32))
    ud = jnp.asarray(rng.standard_normal((B, T, C, K - 1)).astype(np.float32))

    y, lad = splines.piecewise_rational_quadratic_transform(
        x, uw, uh, ud, inverse=False, tails="linear", tail_bound=5.0
    )
    x_rt, lad_inv = splines.piecewise_rational_quadratic_transform(
        y, uw, uh, ud, inverse=True, tails="linear", tail_bound=5.0
    )
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lad_inv), -np.asarray(lad), rtol=1e-3, atol=1e-4)

    # outside the tail bound the map is the identity
    outside = np.abs(np.asarray(x)) > 5.0
    np.testing.assert_allclose(np.asarray(y)[outside], np.asarray(x)[outside])
    assert np.all(np.asarray(lad)[outside] == 0)

    # logabsdet == log |dy/dx| elementwise (autodiff check)
    def f_elem(xi, uwi, uhi, udi):
        yi, _ = splines.piecewise_rational_quadratic_transform(
            xi[None], uwi[None], uhi[None], udi[None],
            inverse=False, tails="linear", tail_bound=5.0,
        )
        return yi[0]

    grad = jax.vmap(
        jax.vmap(
            jax.vmap(jax.grad(f_elem), in_axes=(0, 0, 0, 0)), in_axes=(0, 0, 0, 0)
        ),
        in_axes=(0, 0, 0, 0),
    )(x, uw, uh, ud)
    np.testing.assert_allclose(
        np.log(np.abs(np.asarray(grad)) + 1e-12), np.asarray(lad), rtol=1e-3, atol=1e-3
    )


@pytest.mark.parametrize("flow_cls,kwargs", [
    (ElementwiseAffine, dict(channels=4)),
    (Flip, dict()),
    (ResidualCouplingLayer, dict(channels=4, hidden_channels=8, kernel_size=5,
                                 dilation_rate=1, n_layers=2, mean_only=True)),
    (ConvFlow, dict(in_channels=2, filter_channels=16, kernel_size=3, n_layers=2)),
])
def test_flow_invertibility(rng, flow_cls, kwargs):
    B, T = 2, 9
    C = kwargs.get("channels", kwargs.get("in_channels", 4))
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    lengths = np.array([9, 6])
    x_mask = jnp.asarray(
        (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)
    )[..., None]
    x = x * x_mask

    flow = flow_cls(**kwargs)
    variables = flow.init(jax.random.PRNGKey(0), x, x_mask)
    # perturb zero-initialized projections so the flow is non-trivial
    params = jax.tree.map(
        lambda p: p + 0.1 * np.random.default_rng(0).standard_normal(p.shape).astype(p.dtype),
        variables["params"],
    ) if variables.get("params") else {}

    out = flow.apply({"params": params}, x, x_mask, reverse=False)
    y, logdet = out
    assert logdet.shape == (B,)
    x_rt = flow.apply({"params": params}, y, x_mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), rtol=1e-3, atol=1e-4)


def test_log_flow_roundtrip(rng):
    B, T, C = 2, 5, 1
    x = jnp.asarray(rng.uniform(0.1, 4.0, (B, T, C)).astype(np.float32))
    mask = jnp.ones((B, T, 1))
    flow = Log()
    y, logdet = flow.apply({}, x, mask, reverse=False)
    x_rt = flow.apply({}, y, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(logdet), -np.log(np.asarray(x)).sum((1, 2)), rtol=1e-4
    )


def test_wn_shapes_and_masking(rng):
    B, T, H, G = 2, 12, 16, 8
    x = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((B, 1, G)).astype(np.float32))
    lengths = np.array([12, 7])
    mask = jnp.asarray((np.arange(T)[None] < lengths[:, None]).astype(np.float32))[..., None]

    wn = WN(H, kernel_size=5, dilation_rate=1, n_layers=3, gin_channels=G)
    params = wn.init(jax.random.PRNGKey(0), x, mask, g)["params"]
    y = wn.apply({"params": params}, x * mask, mask, g)
    assert y.shape == (B, T, H)
    # masked tail positions produce zeros
    assert np.allclose(np.asarray(y)[1, 7:], 0)


def test_encoder_mask_independence(rng):
    """Padded positions must not influence valid outputs."""
    B, T, H = 2, 10, 16
    x = rng.standard_normal((B, T, H)).astype(np.float32)
    lengths = np.array([10, 6])
    mask = jnp.asarray((np.arange(T)[None] < lengths[:, None]).astype(np.float32))[..., None]

    enc = Encoder(H, 32, n_heads=2, n_layers=2, kernel_size=3, window_size=4)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), mask)["params"]

    y1 = enc.apply({"params": params}, jnp.asarray(x) * mask, mask)
    x2 = x.copy()
    x2[1, 6:] = 99.0  # garbage in padding
    y2 = enc.apply({"params": params}, jnp.asarray(x2) * mask, mask)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_mha_rel_window_shapes(rng):
    B, T, C = 2, 7, 16
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    mha = MultiHeadAttention(C, C, n_heads=4, window_size=4)
    params = mha.init(jax.random.PRNGKey(0), x, x)["params"]
    y = mha.apply({"params": params}, x, x)
    assert y.shape == (B, T, C)
    assert "emb_rel_k" in params


def test_hifigan_generator_shapes(rng):
    B, T, C = 2, 13, 24
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    gen = Generator(
        resblock="1",
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        upsample_rates=(8, 2),
        upsample_initial_channel=32,
        upsample_kernel_sizes=(16, 4),
    )
    params = gen.init(jax.random.PRNGKey(0), x)["params"]
    y = gen.apply({"params": params}, x)
    assert y.shape == (B, T * 16, 1)
    assert float(jnp.max(jnp.abs(y))) <= 1.0


def test_packed_generator_exact_equivalence(rng):
    """pack_narrow produces identical waveforms with identical params."""
    B, T, C = 1, 16, 24
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    kw = dict(
        resblock="1",
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
        upsample_rates=(8, 2),
        upsample_initial_channel=64,
        upsample_kernel_sizes=(16, 4),
    )
    gen_plain = Generator(**kw, pack_narrow=False)
    gen_packed = Generator(**kw, pack_narrow=True)
    params = gen_plain.init(jax.random.PRNGKey(0), x)["params"]
    y1 = gen_plain.apply({"params": params}, x)
    y2 = gen_packed.apply({"params": params}, x)  # same param structure
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4, atol=1e-5)

    # masked path equivalence too
    mask = jnp.ones((B, T, 1)).at[:, 12:].set(0.0)
    y1m = gen_plain.apply({"params": params}, x, x_mask=mask)
    y2m = gen_packed.apply({"params": params}, x, x_mask=mask)
    np.testing.assert_allclose(np.asarray(y1m), np.asarray(y2m), rtol=1e-4, atol=1e-5)


def test_transformer_decoder_and_fft_blocks(rng):
    """Causal Decoder (cross-attention) and FFT blocks: shapes + causality."""
    from torch_tts_tpu.ops.transformer import FFT, Decoder as TDecoder

    B, T, Tm, H = 2, 6, 9, 16
    x = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))
    h = jnp.asarray(rng.standard_normal((B, Tm, H)).astype(np.float32))
    x_mask = jnp.ones((B, T, 1))
    h_mask = jnp.ones((B, Tm, 1))

    dec = TDecoder(H, 32, n_heads=2, n_layers=2, kernel_size=3)
    p = dec.init(jax.random.PRNGKey(0), x, x_mask, h, h_mask)["params"]
    y = dec.apply({"params": p}, x, x_mask, h, h_mask)
    assert y.shape == (B, T, H)

    # causality: output at t must not depend on x at t' > t
    x2 = x.at[:, -1].set(99.0)
    y2 = dec.apply({"params": p}, x2, x_mask, h, h_mask)
    np.testing.assert_allclose(np.asarray(y[:, :-1]), np.asarray(y2[:, :-1]),
                               atol=1e-5)

    fft = FFT(H, 32, n_heads=2, n_layers=1, kernel_size=3)
    pf = fft.init(jax.random.PRNGKey(0), x, x_mask)["params"]
    yf = fft.apply({"params": pf}, x, x_mask)
    assert yf.shape == (B, T, H)
    yf2 = fft.apply({"params": pf}, x2, x_mask)
    np.testing.assert_allclose(np.asarray(yf[:, :-1]), np.asarray(yf2[:, :-1]),
                               atol=1e-5)


def test_proximal_init_q_equals_k(rng):
    """attentions.py:231-234: with proximal_init, conv_k starts as a copy of
    conv_q (weight AND bias); the Decoder/FFT blocks default it on like the
    reference (attentions.py:106,569)."""
    from torch_tts_tpu.ops.transformer import FFT, Decoder

    x = jnp.asarray(rng.standard_normal((1, 6, 16)).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}

    mha = MultiHeadAttention(16, 16, 2, proximal_init=True)
    p = mha.init(rngs, x, x)["params"]
    np.testing.assert_array_equal(p["conv_q"]["kernel"], p["conv_k"]["kernel"])
    np.testing.assert_array_equal(p["conv_q"]["bias"], p["conv_k"]["bias"])
    assert np.abs(p["conv_q"]["kernel"] - p["conv_v"]["kernel"]).max() > 0

    off = MultiHeadAttention(16, 16, 2, proximal_init=False)
    p_off = off.init(rngs, x, x)["params"]
    assert np.abs(p_off["conv_q"]["kernel"] - p_off["conv_k"]["kernel"]).max() > 0

    xm = jnp.ones((1, 6, 1))
    dec = Decoder(16, 32, 2, 2)
    pd = dec.init(rngs, x, xm, x, xm)["params"]
    for i in range(2):
        np.testing.assert_array_equal(
            pd[f"self_attn_{i}"]["conv_q"]["kernel"],
            pd[f"self_attn_{i}"]["conv_k"]["kernel"],
        )
        # cross-attention is NOT proximally initialized (reference: only
        # self_attn_layers get proximal_init, attentions.py:128-137)
        assert np.abs(
            pd[f"encdec_attn_{i}"]["conv_q"]["kernel"]
            - pd[f"encdec_attn_{i}"]["conv_k"]["kernel"]
        ).max() > 0


def test_fft_multilayer_gin_shared_cond_pre(rng):
    """FFT with n_layers>1 and gin conditioning: one cond_pre module shared
    across layers (attentions.py:577-579) — must init without scope
    collisions and apply cleanly."""
    from torch_tts_tpu.ops.transformer import FFT

    fft = FFT(hidden_channels=8, filter_channels=16, n_heads=2, n_layers=3,
              gin_channels=4)
    x = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    xm = jnp.ones((2, 5, 1))
    g = jnp.asarray(rng.standard_normal((2, 1, 4)).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    v = fft.init(rngs, x, xm, g)
    assert "cond_pre" in v["params"] and "self_attn_2" in v["params"]
    y = fft.apply(v, x, xm, g, deterministic=True)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


def test_packed_tail_generator_ljspeech_geometry(rng):
    """Packed tail at the production 8-8-2-2 geometry (channels 256/128/64/32
    -> pack engages at stage 2, P*C == 128 through stage 3 and conv_post),
    incl. the stop_after_stage diagnostic (must return unpacked layout)."""
    from torch_tts_tpu.ops.hifigan import Generator

    B, T, C = 1, 8, 16
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    kw = dict(
        resblock="2",
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        upsample_rates=(8, 8, 2, 2),
        upsample_initial_channel=512,
        upsample_kernel_sizes=(16, 16, 4, 4),
    )
    gen_plain = Generator(**kw, pack_narrow=False)
    gen_packed = Generator(**kw, pack_narrow=True)
    params = gen_plain.init(jax.random.PRNGKey(0), x)["params"]
    y1 = gen_plain.apply({"params": params}, x)
    y2 = gen_packed.apply({"params": params}, x)
    assert y1.shape == y2.shape == (B, T * 256, 1)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4,
                               atol=1e-5)
    for s in (2, 3):
        a = gen_plain.apply({"params": params}, x, stop_after_stage=s)
        b = gen_packed.apply({"params": params}, x, stop_after_stage=s)
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)
