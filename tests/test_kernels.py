"""Pallas kernels (interpret mode on CPU): fused gated cell fwd/bwd parity
with autodiff, fused STFT+mel parity with the XLA frontend."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_tts_tpu.audio import mel as melmod
from torch_tts_tpu.kernels.gated_cell import lltm, lltm_ref, _lltm_fwd_pallas
from torch_tts_tpu.kernels.stft import mel_spectrogram_fused


def make_lltm_inputs(rng, B=4, I=6, H=8):
    x = jnp.asarray(rng.standard_normal((B, I)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3 * H, H + I)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.standard_normal((3 * H,)).astype(np.float32) * 0.1)
    h = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    return x, w, b, h, c


def test_lltm_forward_matches_ref(rng):
    args = make_lltm_inputs(rng)
    h1, c1 = lltm(*args)
    h2, c2 = lltm_ref(*args)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-5, atol=1e-6)


def test_lltm_pallas_kernel_interpret(rng):
    args = make_lltm_inputs(rng)
    h1, c1, gates = _lltm_fwd_pallas(*args, interpret=True)
    h2, c2 = lltm_ref(*args)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-5, atol=1e-6)


def test_lltm_analytic_backward_matches_autodiff(rng):
    args = make_lltm_inputs(rng)

    def loss_custom(*a):
        h, c = lltm(*a)
        return jnp.sum(h**2) + jnp.sum(jnp.sin(c))

    def loss_ref(*a):
        h, c = lltm_ref(*a)
        return jnp.sum(h**2) + jnp.sum(jnp.sin(c))

    g1 = jax.grad(loss_custom, argnums=(0, 1, 2, 3, 4))(*args)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fused_stft_mel_matches_xla(rng):
    y = (rng.standard_normal((2, 4096)) * 0.3).astype(np.float32)
    ref = melmod.mel_spectrogram(jnp.asarray(y), 256, 20, 8000, 64, 256)
    fused = mel_spectrogram_fused(
        jnp.asarray(y), 256, 20, 8000, 64, 256, block_frames=32, interpret=True
    )
    assert fused.shape == ref.shape
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=2e-3, atol=2e-4)
