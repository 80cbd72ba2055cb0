"""Tacotron-style audio frontend (torchaudio-equivalent path).

Equivalent of /root/reference/tacotron/data/audio.py AudioFrontend:
  encode: resample -> peak normalize -> window-normalized power STFT
          (center=True) -> slaney MelScale -> amplitude_to_DB
  decode: DB -> power -> Griffin-Lim
  mel_inv: DB mel -> power mel -> inverse mel (the reference uses
           torchaudio's iterative InverseMelScale; here a Tikhonov-regularized
           pseudo-inverse — same role, closed form, TPU-friendly; validated by
           audio round-trip rather than op-level parity, per SURVEY.md §7).

Also the mel normalization pair m_fwd/m_rev = clip((x+100)/100)
(/root/reference/tacotron/data/dataset.py:179-184).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from torch_tts_tpu.audio.mel import hann_window, mel_filterbank
from torch_tts_tpu.core.config import TacotronAudioConfig


def amplitude_to_db(x, multiplier: float = 10.0, amin: float = 1e-12, db_multiplier: float = 0.0):
    """torchaudio.functional.amplitude_to_DB (power in, dB out)."""
    return multiplier * jnp.log10(jnp.clip(x, min=amin)) - multiplier * db_multiplier


def db_to_amplitude(x, ref: float = 1.0, power: float = 1.0):
    return ref * jnp.power(jnp.power(10.0, 0.1 * x), power)


def m_fwd(mel_db):
    """dB mel -> [0, 1] network domain (dataset.py:179)."""
    return jnp.clip((mel_db + 100.0) / 100.0, 0.0, 1.0)


def m_rev(mel_net):
    return mel_net * 100.0 - 100.0


def resample_poly(wav: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    """Host-side polyphase resampling (scipy)."""
    from scipy.signal import resample_poly as _rp
    from math import gcd

    g = gcd(orig_sr, new_sr)
    return _rp(wav, new_sr // g, orig_sr // g).astype(np.float32)


class AudioFrontend:
    """Stateless frontend bound to a TacotronAudioConfig."""

    def __init__(self, config: TacotronAudioConfig):
        self.config = config
        self.n_fft = config.win_length
        self.hop = config.hop_length
        self.n_freqs = self.n_fft // 2 + 1
        self._window = jnp.asarray(hann_window(self.n_fft))
        # window-normalized STFT (torchaudio Spectrogram(normalized=True))
        self._win_norm = float(np.sqrt(np.sum(hann_window(self.n_fft) ** 2)))
        self._mel_fb = jnp.asarray(
            mel_filterbank(
                config.sample_rate, self.n_fft, config.num_mels,
                config.fmin, config.fmax,
            )
        )  # [M, F]
        # Tikhonov-regularized pseudo-inverse for mel inversion
        fb = np.asarray(self._mel_fb)
        self._mel_pinv = jnp.asarray(
            np.linalg.solve(fb @ fb.T + 1e-8 * np.eye(fb.shape[0]), fb).T
        )  # [F, M]

    # -- core transforms -------------------------------------------------

    def _stft_power(self, wave: jax.Array) -> jax.Array:
        """[L] or [B, L] -> [.., T, F] power spectrogram, center=True."""
        squeeze = wave.ndim == 1
        if squeeze:
            wave = wave[None]
        pad = self.n_fft // 2
        y = jnp.pad(wave, ((0, 0), (pad, pad)), mode="reflect")
        n_frames = 1 + (y.shape[-1] - self.n_fft) // self.hop
        idx = np.arange(self.n_fft)[None, :] + self.hop * np.arange(n_frames)[:, None]
        frames = y[:, idx] * self._window
        spec = jnp.fft.rfft(frames, n=self.n_fft, axis=-1)
        power = (jnp.real(spec) ** 2 + jnp.imag(spec) ** 2) / (self._win_norm**2)
        return power[0] if squeeze else power

    def _istft(self, spec: jax.Array, length: Optional[int] = None) -> jax.Array:
        """[T, F] complex -> [L] waveform via windowed overlap-add."""
        frames = jnp.fft.irfft(spec, n=self.n_fft, axis=-1)  # [T, n_fft]
        frames = frames * self._window
        T = frames.shape[0]
        out_len = self.n_fft + (T - 1) * self.hop
        idx = np.arange(self.n_fft)[None, :] + self.hop * np.arange(T)[:, None]
        wav = jnp.zeros((out_len,)).at[idx.reshape(-1)].add(frames.reshape(-1))
        wsq = jnp.zeros((out_len,)).at[idx.reshape(-1)].add(
            jnp.tile(self._window**2, (T,))
        )
        wav = wav / jnp.maximum(wsq, 1e-8)
        pad = self.n_fft // 2
        wav = wav[pad : out_len - pad]
        if length is not None:
            wav = wav[:length]
        return wav

    def griffin_lim(self, power_spec: jax.Array, n_iter: int = 32,
                    momentum: float = 0.99, rng: Optional[jax.Array] = None) -> jax.Array:
        """Phase reconstruction from a [T, F] power spectrogram (torchaudio
        GriffinLim(power=2) equivalent, with momentum acceleration)."""
        mag = jnp.sqrt(jnp.clip(power_spec, 0.0)) * self._win_norm
        if rng is None:
            rng = jax.random.PRNGKey(0)
        angles = jnp.exp(
            1j * jax.random.uniform(rng, mag.shape, jnp.float32, 0, 2 * np.pi)
        )

        def body(carry, _):
            angles, prev = carry
            full = mag.astype(jnp.complex64) * angles
            wav = self._istft(full)
            re = self._stft_power_complex(wav)
            update = re - momentum * prev
            angles = update / jnp.maximum(jnp.abs(update), 1e-16)
            return (angles, re), None

        (angles, _), _ = jax.lax.scan(body, (angles, jnp.zeros_like(angles)), None,
                                      length=n_iter)
        return self._istft(mag.astype(jnp.complex64) * angles)

    def _stft_power_complex(self, wave: jax.Array) -> jax.Array:
        pad = self.n_fft // 2
        y = jnp.pad(wave[None], ((0, 0), (pad, pad)), mode="reflect")[0]
        n_frames = 1 + (y.shape[-1] - self.n_fft) // self.hop
        idx = np.arange(self.n_fft)[None, :] + self.hop * np.arange(n_frames)[:, None]
        frames = y[idx] * self._window
        return jnp.fft.rfft(frames, n=self.n_fft, axis=-1)

    # -- public API (audio.py:55-76) -------------------------------------

    def encode(self, wave, sr: Optional[int] = None) -> Tuple[jax.Array, jax.Array]:
        """wave [L] -> (D_db [T, F], M_db [T, M])."""
        if sr is not None and sr != self.config.sample_rate:
            wave = jnp.asarray(
                resample_poly(np.asarray(wave), sr, self.config.sample_rate)
            )
        wave = wave / jnp.maximum(jnp.max(jnp.abs(wave)), 1e-8)
        D = self._stft_power(wave)  # [T, F]
        M = jnp.einsum("tf,mf->tm", D, self._mel_fb)
        return amplitude_to_db(D), amplitude_to_db(M)

    def decode(self, D_db: jax.Array, n_iter: int = 32) -> jax.Array:
        """[T, F] dB spectrogram -> waveform via Griffin-Lim."""
        return self.griffin_lim(db_to_amplitude(D_db), n_iter=n_iter)

    def mel_inv(self, M_db: jax.Array) -> jax.Array:
        """[T, M] dB mel -> [T, F] dB linear via regularized pinv."""
        M = db_to_amplitude(M_db)
        D = jnp.clip(jnp.einsum("tm,fm->tf", M, self._mel_pinv), 0.0)
        return amplitude_to_db(D)
