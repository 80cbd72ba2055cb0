"""Parity tests for the mel frontend vs torch.stft (the reference's STFT
backend, vits2/mel_processing.py:80) and a dual-implementation check of the
slaney filterbank (the repo's own testing idiom, tools/alignment.py:156-172)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from torch_tts_tpu.audio import mel as M


def torch_spectrogram(y_np, n_fft, hop, win):
    """Oracle: the same operator sequence the reference runs, built directly on
    public torch ops (reflect pad + center=False stft + sqrt(power+1e-6))."""
    y = torch.from_numpy(y_np)[None]
    pad = int((n_fft - hop) / 2)
    y = torch.nn.functional.pad(y[None], (pad, pad), mode="reflect")[0]
    window = torch.hann_window(win)
    spec = torch.stft(
        y, n_fft, hop_length=hop, win_length=win, window=window,
        center=False, normalized=False, onesided=True, return_complex=True,
    )
    mag = torch.sqrt(spec.real**2 + spec.imag**2 + 1e-6)
    return mag[0].numpy().T  # [T, F]


@pytest.mark.parametrize("n_samples", [8192, 22050, 40960])
def test_spectrogram_matches_torch_stft(rng, n_samples):
    n_fft, hop, win = 1024, 256, 1024
    y = (rng.standard_normal(n_samples) * 0.1).astype(np.float32)
    ours = np.asarray(M.spectrogram(jnp.asarray(y), n_fft, hop, win))
    ref = torch_spectrogram(y, n_fft, hop, win)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_mel_filterbank_properties():
    fb = M.mel_filterbank(22050, 1024, 80, 0.0, None)
    assert fb.shape == (80, 513)
    assert np.all(fb >= 0)
    # every filter has support
    assert np.all(fb.sum(axis=1) > 0)
    # triangles peak between fmin and fmax and centers are increasing
    centers = fb.argmax(axis=1)
    assert np.all(np.diff(centers) >= 0)


def _mel_filterbank_naive(sr, n_fft, n_mels, fmin, fmax):
    """Independent scalar-loop implementation of the slaney filterbank
    (dual-implementation parity, mirroring the reference's only test idiom)."""
    def h2m(f):
        if f < 1000.0:
            return f / (200.0 / 3.0)
        return 15.0 + np.log(f / 1000.0) / (np.log(6.4) / 27.0)

    def m2h(m):
        if m < 15.0:
            return m * (200.0 / 3.0)
        return 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0))

    n_freqs = n_fft // 2 + 1
    freqs = [sr / 2.0 * i / (n_freqs - 1) for i in range(n_freqs)]
    mlo, mhi = h2m(fmin), h2m(fmax)
    pts = [m2h(mlo + (mhi - mlo) * i / (n_mels + 1)) for i in range(n_mels + 2)]
    fb = np.zeros((n_mels, n_freqs))
    for m in range(n_mels):
        f_l, f_c, f_r = pts[m], pts[m + 1], pts[m + 2]
        for k, f in enumerate(freqs):
            if f_l < f < f_c:
                fb[m, k] = (f - f_l) / (f_c - f_l)
            elif f_c <= f < f_r:
                fb[m, k] = (f_r - f) / (f_r - f_c)
            elif f == f_c:
                fb[m, k] = 1.0
        fb[m] *= 2.0 / (f_r - f_l)
    return fb


def test_mel_filterbank_vs_naive():
    fb = M.mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    naive = _mel_filterbank_naive(22050, 1024, 80, 0.0, 8000.0)
    np.testing.assert_allclose(fb, naive, rtol=1e-5, atol=1e-7)


def test_mel_spectrogram_pipeline(rng):
    y = (rng.standard_normal((2, 22016)) * 0.2).astype(np.float32)
    mel = M.mel_spectrogram(jnp.asarray(y), 1024, 80, 22050, 256, 1024)
    assert mel.shape == (2, 22016 // 256, 80)
    # log-clamp floor
    assert float(mel.min()) >= np.log(1e-5) - 1e-6

    # fused == two-step
    spec = M.spectrogram(jnp.asarray(y), 1024, 256, 1024)
    mel2 = M.spec_to_mel(spec, 1024, 80, 22050)
    np.testing.assert_allclose(np.asarray(mel), np.asarray(mel2), rtol=1e-6)


def test_compression_roundtrip(rng):
    x = jnp.asarray(rng.uniform(1e-4, 10.0, (4, 7)).astype(np.float32))
    y = M.dynamic_range_decompression(M.dynamic_range_compression(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=2e-4)
