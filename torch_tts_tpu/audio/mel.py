"""STFT + mel filterbank frontend (VITS2-parity path).

Numerically matches the reference pipeline in /root/reference/vits2/mel_processing.py:
  spectrogram_torch (:58)  — reflect pad (n_fft-hop)/2, periodic hann,
                             center=False torch.stft, sqrt(re^2+im^2+1e-6)
  spec_to_mel_torch (:109) — slaney-scale/slaney-norm mel basis matmul,
                             log-clamp(1e-5) compression
  mel_spectrogram_torch (:125) — both fused

TPU-first design notes:
- Framing is a reshape+slice (static shapes), the DFT is `jnp.fft.rfft`; a
  fused Pallas frame+window+DFT-matmul+mel kernel lives in
  torch_tts_tpu/kernels/stft.py for the hot path (the DFT of a 1024-point
  frame is expressed as two matmuls that ride the MXU).
- Everything here is jit-safe with static n_fft/hop/win; batches of wavs are
  processed as [B, L] arrays.
- The mel basis is a pure function of static config — computed in numpy once
  and closed over as a constant (XLA folds it into the compiled executable).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window, matching torch.hann_window(win_length)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


# ---------------------------------------------------------------------------
# Slaney mel scale (Auditory Toolbox formula; what librosa.filters.mel(htk=False)
# and torchaudio mel_scale="slaney" both implement).
# ---------------------------------------------------------------------------

_F_SP = 200.0 / 3.0
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = math.log(6.4) / 27.0


def hz_to_mel(f):
    f = np.asarray(f, dtype=np.float64)
    mel = f / _F_SP
    return np.where(
        f >= _MIN_LOG_HZ, _MIN_LOG_MEL + np.log(np.maximum(f, 1e-10) / _MIN_LOG_HZ) / _LOGSTEP, mel
    )


def mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f = m * _F_SP
    return np.where(m >= _MIN_LOG_MEL, _MIN_LOG_HZ * np.exp(_LOGSTEP * (m - _MIN_LOG_MEL)), f)


@functools.lru_cache(maxsize=16)
def mel_filterbank(
    sampling_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    norm_slaney: bool = True,
) -> np.ndarray:
    """[n_mels, n_fft//2+1] triangular slaney-scale filterbank.

    Matches librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax) with the
    default htk=False, norm="slaney" (the reference's mel basis,
    vits2/mel_processing.py:114).
    """
    if fmax is None:
        fmax = sampling_rate / 2.0
    n_freqs = n_fft // 2 + 1
    fftfreqs = np.linspace(0.0, sampling_rate / 2.0, n_freqs)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)  # [n_mels+2]
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]  # [n_mels+2, n_freqs]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm_slaney:
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# Framing + STFT
# ---------------------------------------------------------------------------


def _frame(y: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """[..., L] -> [..., n_frames, frame_length] strided framing (center=False)."""
    n_frames = 1 + (y.shape[-1] - frame_length) // hop
    idx = np.arange(frame_length)[None, :] + hop * np.arange(n_frames)[:, None]
    return y[..., idx]


def num_frames(n_samples: int, hop_length: int) -> int:
    """Frame count produced by `spectrogram` for an unpadded signal length."""
    return n_samples // hop_length


def spectrogram(
    y: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool = False,
) -> jax.Array:
    """Magnitude STFT matching vits2/mel_processing.py:58 spectrogram_torch.

    y: [B, L] (or [L]) waveform in [-1, 1].
    Returns [B, T, n_fft//2+1] channels-last magnitudes (the reference returns
    [B, F, T]; transpose relation is intentional — [B, T, F] keeps the lane
    dim on frequencies).
    """
    assert win_length == n_fft, "reference always uses win_length == n_fft"
    squeeze = y.ndim == 1
    if squeeze:
        y = y[None]
    pad = int((n_fft - hop_length) / 2)
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    frames = _frame(y, n_fft, hop_length)  # [B, T, n_fft]
    window = jnp.asarray(hann_window(win_length))
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)  # [B, T, F]
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-6)
    return mag[0] if squeeze else mag


def dynamic_range_compression(x: jax.Array, C: float = 1.0, clip_val: float = 1e-5):
    """log-clamp compression (vits2/mel_processing.py:26)."""
    return jnp.log(jnp.clip(x, min=clip_val) * C)


def dynamic_range_decompression(x: jax.Array, C: float = 1.0):
    return jnp.exp(x) / C


def spec_to_mel(
    spec: jax.Array,
    n_fft: int,
    n_mels: int,
    sampling_rate: int,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> jax.Array:
    """[.., T, F] magnitudes -> [.., T, n_mels] log-mel (vits2/mel_processing.py:109)."""
    basis = jnp.asarray(mel_filterbank(sampling_rate, n_fft, n_mels, fmin, fmax))
    mel = jnp.einsum("...tf,mf->...tm", spec, basis)
    return dynamic_range_compression(mel)


def mel_spectrogram(
    y: jax.Array,
    n_fft: int,
    n_mels: int,
    sampling_rate: int,
    hop_length: int,
    win_length: int,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> jax.Array:
    """Waveform -> log-mel, fusing spectrogram+mel (vits2/mel_processing.py:125).

    [B, L] -> [B, T, n_mels].
    """
    spec = spectrogram(y, n_fft, hop_length, win_length)
    return spec_to_mel(spec, n_fft, n_mels, sampling_rate, fmin, fmax)


def mel_spectrogram_cfg(y: jax.Array, audio_cfg) -> jax.Array:
    """mel_spectrogram driven by an AudioConfig."""
    return mel_spectrogram(
        y,
        audio_cfg.filter_length,
        audio_cfg.n_mel_channels,
        audio_cfg.sampling_rate,
        audio_cfg.hop_length,
        audio_cfg.win_length,
        audio_cfg.mel_fmin,
        audio_cfg.mel_fmax,
    )
