"""End-to-end shape/behavior tests for the VITS2 model assembly, on a tiny
config (fast on CPU)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_tts_tpu.core.config import VITS2ModelConfig
from torch_tts_tpu.models.vits2 import SynthesizerTrn, MultiPeriodDiscriminator

TINY = VITS2ModelConfig(
    inter_channels=16,
    hidden_channels=16,
    filter_channels=32,
    n_heads=2,
    n_layers=2,
    kernel_size=3,
    p_dropout=0.1,
    resblock="2",
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
    upsample_rates=(4, 2),
    upsample_initial_channel=32,
    upsample_kernel_sizes=(8, 4),
    use_sdp=True,
    use_transformer_flows=True,
    transformer_flow_type="pre_conv",
    segment_size=8 * 64,  # 8 frames at hop 64
)
HOP = 8  # upsample product
N_VOCAB = 30
SPEC_CH = 20


def make_model(cfg=TINY):
    return SynthesizerTrn(
        n_vocab=N_VOCAB, spec_channels=SPEC_CH, segment_frames=8, cfg=cfg
    )


def make_inputs(rng, B=2, T_x=11, T_y=40):
    x = jnp.asarray(rng.integers(1, N_VOCAB, (B, T_x)))
    x_lengths = jnp.asarray([T_x, T_x - 3])
    y = jnp.asarray(rng.standard_normal((B, T_y, SPEC_CH)).astype(np.float32))
    y_lengths = jnp.asarray([T_y, T_y - 10])
    return x, x_lengths, y, y_lengths


def init_and_forward(model, rng, **kw):
    x, x_lengths, y, y_lengths = make_inputs(rng)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "noise": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    variables = model.init(rngs, x, x_lengths, y, y_lengths, **kw)
    out = model.apply(
        variables,
        x,
        x_lengths,
        y,
        y_lengths,
        rngs={"noise": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        **kw,
    )
    return variables, out


def test_forward_shapes(rng):
    model = make_model()
    variables, out = init_and_forward(model, rng)
    o, l_length, attn, ids_slice, x_mask, y_mask, latents, duration = out
    B, T_x, T_y = 2, 11, 40
    assert o.shape == (B, 8 * HOP, 1)
    assert attn.shape == (B, T_y, T_x)
    assert l_length.shape[0] == B
    z, z_p, m_p, logs_p, m_q, logs_q = latents
    assert z.shape == (B, T_y, TINY.inter_channels)
    assert m_p.shape == (B, T_y, TINY.inter_channels)  # expanded prior
    hx, logw, logw_ = duration
    assert logw.shape == (B, T_x, 1)

    # attention is a valid monotonic path within masks
    a = np.asarray(attn)
    ylen = np.asarray([40, 30])
    xlen = np.asarray([11, 8])
    for b in range(B):
        valid = a[b, : ylen[b], : xlen[b]]
        assert np.all(valid.sum(axis=1) == 1)
        pos = valid.argmax(axis=1)
        assert np.all(np.diff(pos) >= 0)
        assert a[b, ylen[b]:].sum() == 0 and a[b, :, xlen[b]:].sum() == 0


@pytest.mark.parametrize(
    "flow_type",
    ["pre_conv", "pre_conv2", "fft", "mono_layer_inter_residual", "mono_layer_post_residual"],
)
def test_all_flow_types_forward(rng, flow_type):
    cfg = dataclasses.replace(TINY, transformer_flow_type=flow_type)
    model = make_model(cfg)
    variables, out = init_and_forward(model, rng)
    assert out[0].shape == (2, 8 * HOP, 1)


def test_plain_vits1_flows_and_dp(rng):
    cfg = dataclasses.replace(TINY, use_transformer_flows=False, use_sdp=False)
    model = make_model(cfg)
    variables, out = init_and_forward(model, rng)
    assert out[0].shape == (2, 8 * HOP, 1)


def test_infer_static_shapes(rng):
    model = make_model()
    x, x_lengths, y, y_lengths = make_inputs(rng)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "noise": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    variables = model.init(rngs, x, x_lengths, y, y_lengths)

    MAX_FRAMES = 64

    @jax.jit
    def infer_fn(params, x, x_lengths, key):
        return model.apply(
            params,
            x,
            x_lengths,
            noise_scale=0.667,
            noise_scale_w=0.8,
            length_scale=1.0,
            max_frames=MAX_FRAMES,
            method=SynthesizerTrn.infer,
            rngs={"noise": key},
        )

    o, attn, y_mask, aux, y_lengths_out = infer_fn(
        variables, x, x_lengths, jax.random.PRNGKey(7)
    )
    assert o.shape == (2, MAX_FRAMES * HOP, 1)
    assert attn.shape == (2, MAX_FRAMES, 11)
    assert int(y_lengths_out.min()) >= 1
    # audio beyond y_length*hop should be near-silent tail of masked decode
    assert np.all(np.abs(np.asarray(o)) <= 1.0)

    # infer path: durations expand monotonically
    a = np.asarray(attn)
    for b in range(2):
        T = int(np.asarray(y_lengths_out)[b])
        pos = a[b, :T].argmax(axis=1)
        assert np.all(np.diff(pos) >= 0)


def test_multispeaker_and_vc(rng):
    cfg = dataclasses.replace(TINY, n_speakers=4, gin_channels=8)
    model = make_model(cfg)
    x, x_lengths, y, y_lengths = make_inputs(rng)
    sid = jnp.asarray([0, 3])
    rngs = {
        "params": jax.random.PRNGKey(0),
        "noise": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    variables = model.init(rngs, x, x_lengths, y, y_lengths, sid=sid)
    out = model.apply(
        variables, x, x_lengths, y, y_lengths, sid=sid,
        rngs={"noise": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
    )
    assert out[0].shape == (2, 8 * HOP, 1)

    o_hat, y_mask, _ = model.apply(
        variables, y, y_lengths, jnp.asarray([0, 1]), jnp.asarray([2, 3]),
        method=SynthesizerTrn.voice_conversion,
        rngs={"noise": jax.random.PRNGKey(5)},
    )
    assert o_hat.shape == (2, 40 * HOP, 1)


def test_mas_noise_scale_arg(rng):
    model = make_model()
    variables, out = init_and_forward(model, rng, mas_noise_scale=jnp.float32(0.01))
    assert out[0].shape == (2, 8 * HOP, 1)


def test_discriminator_shapes(rng):
    B, L = 2, 256
    y = jnp.asarray(rng.standard_normal((B, L, 1)).astype(np.float32))
    y_hat = jnp.asarray(rng.standard_normal((B, L, 1)).astype(np.float32))
    mpd = MultiPeriodDiscriminator()
    params = mpd.init(jax.random.PRNGKey(0), y, y_hat)
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = mpd.apply(params, y, y_hat)
    assert len(y_d_rs) == 6 and len(fmap_rs) == 6
    for out in y_d_rs:
        assert out.shape[0] == B
