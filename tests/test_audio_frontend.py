"""Tacotron audio frontend: STFT vs torch center=True oracle, mel inversion
quality, Griffin-Lim reconstruction quality on a synthetic harmonic signal."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from torch_tts_tpu.audio.frontend import AudioFrontend, amplitude_to_db, db_to_amplitude, m_fwd, m_rev
from torch_tts_tpu.core.config import TacotronAudioConfig

CFG = TacotronAudioConfig(
    sample_rate=22050, hop_length=256, win_length=1024, num_mels=80,
    fmin=50.0, fmax=7600.0,
)


def harmonic_signal(n, sr=22050):
    t = np.arange(n) / sr
    f0 = 220.0
    sig = sum(np.sin(2 * np.pi * f0 * k * t) / k for k in range(1, 6))
    return (0.5 * sig / np.abs(sig).max()).astype(np.float32)


def test_stft_power_matches_torch(rng):
    fe = AudioFrontend(CFG)
    y = harmonic_signal(8192)
    ours = np.asarray(fe._stft_power(jnp.asarray(y)))
    # torchaudio Spectrogram(normalized=True) divides by ||window||_2
    # (torch.stft's normalized=True uses sqrt(frame_length) instead)
    window = torch.hann_window(1024)
    ref = torch.stft(
        torch.from_numpy(y), 1024, hop_length=256, win_length=1024,
        window=window, center=True, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True,
    ) / window.pow(2).sum().sqrt()
    ref = (ref.real**2 + ref.imag**2).numpy().T  # [T, F]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-6)


def test_db_roundtrip():
    x = jnp.asarray([1e-3, 0.5, 2.0, 100.0])
    db = amplitude_to_db(x)
    back = db_to_amplitude(db)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-4)


def test_m_fwd_rev_roundtrip():
    x = jnp.asarray([-100.0, -50.0, -10.0, 0.0])
    np.testing.assert_allclose(np.asarray(m_rev(m_fwd(x))), np.asarray(x), atol=1e-4)


def test_encode_shapes_and_mel_inv_quality():
    fe = AudioFrontend(CFG)
    y = harmonic_signal(22050)
    D_db, M_db = fe.encode(jnp.asarray(y))
    assert D_db.shape[1] == 513 and M_db.shape[1] == 80
    assert D_db.shape[0] == M_db.shape[0]

    # mel inversion recovers the in-band spectral envelope
    D_rec_db = fe.mel_inv(M_db)
    assert D_rec_db.shape == D_db.shape
    D = np.asarray(db_to_amplitude(D_db))
    D_rec = np.asarray(db_to_amplitude(D_rec_db))
    freqs = np.linspace(0, CFG.sample_rate / 2, 513)
    band = (freqs >= 100) & (freqs <= 7000)
    # dominant in-band energy peaks should survive inversion within ~2x
    p, p_rec = D[:, band].sum(), D_rec[:, band].sum()
    assert 0.3 < p_rec / p < 3.0


def test_griffin_lim_reconstruction():
    fe = AudioFrontend(CFG)
    y = harmonic_signal(16384)
    D_db, _ = fe.encode(jnp.asarray(y))
    wav = np.asarray(fe.decode(D_db, n_iter=16))
    assert wav.ndim == 1 and len(wav) > 0
    # reconstructed signal has a very similar magnitude spectrogram
    D2_db, _ = fe.encode(jnp.asarray(wav))
    T = min(D_db.shape[0], D2_db.shape[0])
    a = np.asarray(db_to_amplitude(D_db))[:T]
    b = np.asarray(db_to_amplitude(D2_db))[:T]
    num = (np.sqrt(a) * np.sqrt(b)).sum()
    den = np.sqrt((a.sum()) * (b.sum()))
    assert num / den > 0.9  # spectral cosine similarity
