"""Streaming chunked decode (infer/streaming.py): concatenated chunks must
equal the monolithic decode EXACTLY (the decoder is convolution-local, and
the chunk windows reproduce the same zero padding the monolithic SAME-padded
convs see at sequence edges) — for both decoder families, for uneven tail
chunks, and for speaker-conditioned decoding."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_vits2_train_step import tiny_config
from torch_tts_tpu.infer.streaming import StreamingDecoder
from torch_tts_tpu.models.vits2 import SynthesizerTrn


def _build(cfg, rng, n_vocab=30):
    model = SynthesizerTrn(
        n_vocab=n_vocab, spec_channels=cfg.posterior_channels,
        segment_frames=cfg.segment_frames, cfg=cfg.model,
    )
    B, T_x, T_y = 1, 9, 24
    x = jnp.asarray(rng.integers(1, n_vocab, (B, T_x)), jnp.int32)
    xl = jnp.full((B,), T_x, jnp.int32)
    spec = jnp.asarray(
        rng.standard_normal((B, T_y, cfg.posterior_channels)).astype(np.float32)
    )
    sl = jnp.full((B,), T_y, jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    sid = jnp.zeros((B,), jnp.int32) if cfg.model.n_speakers > 1 else None
    variables = model.init(rngs, x, xl, spec, sl, sid=sid)
    return model, variables


@pytest.mark.parametrize("decoder", ["hifigan", "mb_istft"])
@pytest.mark.parametrize("T", [96, 100])  # multiple of chunk and uneven tail
def test_streaming_matches_monolithic(rng, decoder, T):
    cfg = tiny_config()
    if decoder == "mb_istft":
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model, decoder_type="mb_istft",
                upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
                subbands=4, gen_istft_n_fft=16, gen_istft_hop_size=4,
            ),
        )
    model, variables = _build(cfg, rng)
    z = jnp.asarray(
        rng.standard_normal((1, T, cfg.model.inter_channels)).astype(np.float32)
    )
    full = model.apply(variables, z, method=lambda m, zz: m.dec(zz))

    sd = StreamingDecoder(model, variables, chunk_frames=32, context_frames=16)
    pieces = list(sd.stream(z))
    assert len(pieces) == -(-T // 32)
    out = jnp.concatenate(pieces, axis=1)
    assert out.shape == full.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(full), atol=2e-5,
        err_msg=f"{decoder}: chunked != monolithic",
    )


def test_streaming_speaker_conditioned(rng):
    cfg = tiny_config(n_speakers=4, gin_channels=8)
    model, variables = _build(cfg, rng)
    z = jnp.asarray(
        rng.standard_normal((1, 64, cfg.model.inter_channels)).astype(np.float32)
    )
    g = jnp.asarray(rng.standard_normal((1, 1, 8)).astype(np.float32))
    full = model.apply(variables, z, g, method=lambda m, zz, gg: m.dec(zz, g=gg))
    sd = StreamingDecoder(model, variables, chunk_frames=16, context_frames=16)
    out = sd.decode(z, g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=2e-5)


@pytest.mark.parametrize("decoder", ["hifigan", "mb_istft"])
def test_streaming_end_to_end_matches_infer(rng, decoder):
    """infer_latents + StreamingDecoder reproduces SynthesizerTrn.infer's
    audio bit-for-bit (masked decode included: the y_mask window rides along
    with the latent window)."""
    cfg = tiny_config()
    if decoder == "mb_istft":
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model, decoder_type="mb_istft",
                upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
                subbands=4, gen_istft_n_fft=16, gen_istft_hop_size=4,
            ),
        )
    model, variables = _build(cfg, rng)
    x = jnp.asarray(rng.integers(1, 30, (1, 9)), jnp.int32)
    xl = jnp.full((1,), 9, jnp.int32)
    kw = dict(noise_scale=0.667, noise_scale_w=0.8, length_scale=1.0,
              max_frames=96)
    noise = {"noise": jax.random.PRNGKey(5)}
    audio, _attn, _ym, _aux, y_len = model.apply(
        variables, x, xl, method=SynthesizerTrn.infer, rngs=noise, **kw
    )
    z, g, y_mask, y_len2 = model.apply(
        variables, x, xl, method=SynthesizerTrn.infer_latents, rngs=noise, **kw
    )
    assert int(y_len[0]) == int(y_len2[0])
    sd = StreamingDecoder(model, variables, chunk_frames=32, context_frames=16)
    out = sd.decode(z, g, y_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(audio), atol=2e-5)


# ---------------------------------------------------------------------------
# StreamingFlowDecoder: flow-reverse chunked along with the decoder
# ---------------------------------------------------------------------------

from torch_tts_tpu.infer.streaming import StreamingFlowDecoder


def _plain_flow_cfg(**model_kw):
    """Conv-local flow: plain residual couplings (use_transformer_flows off)."""
    cfg = tiny_config(**model_kw)
    return dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, use_transformer_flows=False)
    )


@pytest.mark.parametrize("T", [192, 200])
def test_streaming_flow_matches_monolithic(rng, T):
    cfg = _plain_flow_cfg()
    model, variables = _build(cfg, rng)
    z_p = jnp.asarray(
        rng.standard_normal((1, T, cfg.model.inter_channels)).astype(np.float32)
    )
    y_mask = jnp.ones((1, T, 1), jnp.float32)

    def mono(m, zp, mm):
        z = m.flow(zp, mm, reverse=True, deterministic=True)
        return m.dec(z * mm, x_mask=mm)

    full = model.apply(variables, z_p, y_mask, method=mono)
    sfd = StreamingFlowDecoder(model, variables, chunk_frames=32,
                               context_frames=48)
    pieces = list(sfd.stream(z_p, y_mask=y_mask))
    assert len(pieces) == -(-T // 32)
    out = jnp.concatenate(pieces, axis=1)
    assert out.shape == full.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=2e-5)


def test_streaming_flow_end_to_end_matches_infer(rng):
    """infer_pre_flow + StreamingFlowDecoder reproduces infer's audio."""
    cfg = _plain_flow_cfg()
    model, variables = _build(cfg, rng)
    x = jnp.asarray(rng.integers(1, 30, (1, 9)), jnp.int32)
    xl = jnp.full((1,), 9, jnp.int32)
    kw = dict(noise_scale=0.667, noise_scale_w=0.8, length_scale=1.0,
              max_frames=192)
    noise = {"noise": jax.random.PRNGKey(5)}
    audio, _attn, _ym, _aux, y_len = model.apply(
        variables, x, xl, method=SynthesizerTrn.infer, rngs=noise, **kw
    )
    z_p, g, y_mask, y_len2 = model.apply(
        variables, x, xl, method=SynthesizerTrn.infer_pre_flow, rngs=noise, **kw
    )
    assert int(y_len[0]) == int(y_len2[0])
    sfd = StreamingFlowDecoder(model, variables, chunk_frames=32,
                               context_frames=48)
    out = sfd.decode(z_p, g, y_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(audio), atol=2e-5)


def test_streaming_flow_speaker_conditioned(rng):
    cfg = _plain_flow_cfg(n_speakers=4, gin_channels=8)
    model, variables = _build(cfg, rng)
    T = 128
    z_p = jnp.asarray(
        rng.standard_normal((1, T, cfg.model.inter_channels)).astype(np.float32)
    )
    y_mask = jnp.ones((1, T, 1), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, 1, 8)).astype(np.float32))

    def mono(m, zp, mm, gg):
        z = m.flow(zp, mm, g=gg, reverse=True, deterministic=True)
        return m.dec(z * mm, g=gg, x_mask=mm)

    full = model.apply(variables, z_p, y_mask, g, method=mono)
    sfd = StreamingFlowDecoder(model, variables, chunk_frames=32,
                               context_frames=48)
    out = sfd.decode(z_p, g, y_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=2e-5)


def test_streaming_flow_rejects_transformer_flows(rng):
    """Global-attention flows (pre_conv etc.) cannot be windowed exactly —
    construction must refuse rather than silently approximate."""
    cfg = tiny_config()  # default: use_transformer_flows=True, pre_conv
    model, variables = _build(cfg, rng)
    with pytest.raises(ValueError, match="conv-local"):
        StreamingFlowDecoder(model, variables)


def test_infer_boundary_patch_equals_masked_decode(rng):
    """infer's bulk-unmasked + masked-boundary-patch decode
    (SynthesizerTrn._decode_padded) is numerically identical to the
    fully-masked decode in the valid region, and zero beyond it — for
    max_frames beyond the patch window so the patch path actually runs."""
    cfg = tiny_config()
    model, variables = _build(cfg, rng)
    MAX_F = 192  # > _PATCH_WINDOW=128
    x = jnp.asarray(rng.integers(1, 30, (2, 9)), jnp.int32)
    xl = jnp.asarray([9, 7], jnp.int32)
    noise = {"noise": jax.random.PRNGKey(5)}
    kw = dict(noise_scale=0.667, noise_scale_w=0.8, length_scale=1.0,
              max_frames=MAX_F)

    audio, _attn, y_mask, aux, y_len = model.apply(
        variables, x, xl, method=SynthesizerTrn.infer, rngs=noise, **kw
    )
    # oracle: same latents through the fully-masked decoder
    z, g, y_mask2, y_len2 = model.apply(
        variables, x, xl, method=SynthesizerTrn.infer_latents, rngs=noise, **kw
    )
    np.testing.assert_array_equal(np.asarray(y_len), np.asarray(y_len2))
    want = model.apply(
        variables, z, y_mask2, g,
        method=lambda m, zz, mm, gg: m.dec(zz, g=gg, x_mask=mm),
    )
    hop = int(audio.shape[1]) // MAX_F
    got = np.asarray(audio)
    want = np.asarray(want)
    for b in range(2):
        n = int(np.asarray(y_len)[b]) * hop
        np.testing.assert_allclose(
            got[b, :n], want[b, :n], atol=2e-5,
            err_msg=f"item {b}: patched decode != masked decode",
        )
        assert np.abs(got[b, n:]).max() == 0.0, "tail must be zeroed"
