"""Int8 quantized inference (ops/quant.py + conv-layer hooks).

Checkpoint compatibility is the hard requirement: the quantized modules
must expose the IDENTICAL parameter tree (quantization happens at trace
time), so converted reference checkpoints load unchanged. Accuracy is
probabilistic — random-weight SNR lower bounds here; the trained-checkpoint
serving gate lives in BASELINE.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_tts_tpu.ops.layers import Conv1d, ConvTranspose1d
from torch_tts_tpu.ops.quant import (
    int8_conv1d,
    quantize_act_dynamic,
    quantize_weight_per_channel,
)


def _snr_db(ref, approx):
    ref = np.asarray(ref, np.float64)
    err = np.asarray(approx, np.float64) - ref
    return 10.0 * np.log10(np.sum(ref ** 2) / max(np.sum(err ** 2), 1e-30))


def test_weight_quant_exact_on_representable():
    """Channels whose values are integer multiples of (max/127) round-trip
    exactly through (quantize, dequantize)."""
    rng = np.random.default_rng(0)
    w_int = rng.integers(-127, 128, size=(5, 8, 16)).astype(np.float32)
    w_int[0, 0, :] = 127  # pin each channel's absmax so scale = ch_scale
    ch_scale = rng.uniform(0.01, 2.0, size=(16,)).astype(np.float32)
    w = jnp.asarray(w_int * ch_scale)
    w_q, s_w = quantize_weight_per_channel(w)
    np.testing.assert_allclose(
        np.asarray(w_q, np.float32) * np.asarray(s_w), np.asarray(w),
        rtol=1e-5, atol=1e-5,
    )


def test_act_quant_scale_covers_max():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 16)), jnp.float32)
    x_q, s_x = quantize_act_dynamic(x)
    assert int(np.max(np.abs(np.asarray(x_q)))) == 127
    assert _snr_db(x, np.asarray(x_q, np.float32) * float(s_x)) > 35.0


def test_int8_conv1d_matches_fp():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 128, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(5, 64, 32)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1,), [(2, 2)], dimension_numbers=("NWC", "WIO", "NWC")
    ) + b
    out = int8_conv1d(x, w, b, padding=(2, 2))
    assert _snr_db(ref, out) > 35.0


@pytest.mark.parametrize("dilation", [1, 3])
def test_conv1d_module_quant(dilation):
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 64, 32)), jnp.float32)
    pad = (3 * dilation - dilation) // 2
    fp = Conv1d(16, 3, padding=pad, dilation=dilation, weight_norm=True)
    q8 = Conv1d(16, 3, padding=pad, dilation=dilation, weight_norm=True,
                quant="int8")
    params = fp.init(rng, x)
    # identical parameter tree: quantization is trace-time only
    assert jax.tree.structure(params) == jax.tree.structure(q8.init(rng, x))
    y_fp = fp.apply(params, x)
    y_q8 = q8.apply(params, x)
    assert y_q8.dtype == y_fp.dtype
    assert _snr_db(y_fp, y_q8) > 30.0


def test_conv_transpose_module_quant():
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 32, 64)), jnp.float32)
    kw = dict(features=32, kernel_size=16, stride=8, padding=4, weight_norm=True)
    fp = ConvTranspose1d(**kw)
    q8 = ConvTranspose1d(**kw, quant="int8")
    params = fp.init(rng, x)
    assert jax.tree.structure(params) == jax.tree.structure(q8.init(rng, x))
    y_fp = fp.apply(params, x)
    y_q8 = q8.apply(params, x)
    assert y_fp.shape == y_q8.shape == (2, 256, 32)
    assert _snr_db(y_fp, y_q8) > 28.0


@pytest.mark.parametrize("pack_narrow", [False, True])
def test_generator_quant_int8(pack_narrow):
    """Full HiFi-GAN decoder: same params, runs int8 on the wide stages,
    output within random-weight SNR bounds of the fp decoder."""
    from torch_tts_tpu.ops.hifigan import Generator

    kw = dict(
        resblock="1",
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        upsample_rates=(8, 8, 2, 2),
        upsample_initial_channel=128,
        upsample_kernel_sizes=(16, 16, 4, 4),
        pack_narrow=pack_narrow,
    )
    fp = Generator(**kw)
    q8 = Generator(**kw, quant_int8=True)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(1, 32, 48)), jnp.float32)
    params = fp.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(params) == jax.tree.structure(
        q8.init(jax.random.PRNGKey(0), x)
    )
    y_fp = fp.apply(params, x)
    y_q8 = q8.apply(params, x)
    assert y_fp.shape == y_q8.shape
    # errors accumulate across ~10 quantized convs; tanh squashes at the end
    assert _snr_db(y_fp, y_q8) > 18.0


def test_model_config_flag_runs():
    """SynthesizerTrn(quantize_decoder=True) infers with unchanged params."""
    import dataclasses

    from torch_tts_tpu.core.config import VITS2Config
    from torch_tts_tpu.models.vits2 import SynthesizerTrn
    from torch_tts_tpu.text import symbols

    cfg = VITS2Config()
    m = dataclasses.replace(
        cfg.model,
        hidden_channels=32, inter_channels=16, filter_channels=32,
        n_layers=1, n_heads=2, upsample_initial_channel=64,
    )
    mq = dataclasses.replace(m, quantize_decoder=True)
    kw = dict(n_vocab=len(symbols), spec_channels=cfg.posterior_channels,
              segment_frames=cfg.segment_frames)
    model_fp = SynthesizerTrn(cfg=m, **kw)
    model_q8 = SynthesizerTrn(cfg=mq, **kw)
    x = jnp.asarray([[5, 9, 12, 4, 7, 0, 0, 0]], jnp.int32)
    xl = jnp.asarray([5], jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    params = model_fp.init(rngs, x, xl, max_frames=64, method="infer")
    assert jax.tree.structure(params) == jax.tree.structure(
        model_q8.init(rngs, x, xl, max_frames=64, method="infer")
    )
    wav_fp, _, _, _, lengths = model_fp.apply(
        params, x, xl, max_frames=64, method="infer",
        rngs={"noise": jax.random.PRNGKey(2)},
    )
    wav_q8, _, _, _, lengths_q = model_q8.apply(
        params, x, xl, max_frames=64, method="infer",
        rngs={"noise": jax.random.PRNGKey(2)},
    )
    assert wav_fp.shape == wav_q8.shape
    np.testing.assert_array_equal(np.asarray(lengths), np.asarray(lengths_q))
    assert _snr_db(wav_fp, wav_q8) > 12.0


def test_mb_istft_generator_quant():
    from torch_tts_tpu.ops.mb_istft import MultiBandISTFTGenerator

    kw = dict(
        resblock="1",
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        upsample_rates=(4, 4),
        upsample_initial_channel=128,
        upsample_kernel_sizes=(16, 16),
        subbands=4, istft_n_fft=16, istft_hop=4,
    )
    fp = MultiBandISTFTGenerator(**kw)
    q8 = MultiBandISTFTGenerator(**kw, quant_int8=True)
    x = jnp.asarray(np.random.default_rng(6).normal(size=(1, 32, 48)), jnp.float32)
    params = fp.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(params) == jax.tree.structure(
        q8.init(jax.random.PRNGKey(0), x)
    )
    y_fp = fp.apply(params, x)
    y_q8 = q8.apply(params, x)
    assert y_fp.shape == y_q8.shape
    assert _snr_db(y_fp, y_q8) > 18.0
