"""Fused STFT+mel Pallas kernel.

The hot audio-frontend path (vits2/mel_processing.py:125 semantics) as one
TPU kernel per frame block: window -> real DFT as two matmuls (MXU) ->
magnitude -> mel projection (MXU) -> log, with every intermediate resident in
VMEM. The DFT of a 1024-point frame is expressed as frame @ [cos|sin]
matrices — on TPU this is faster than a generic FFT at these sizes and fuses
with the mel matmul.

`mel_spectrogram_fused` matches torch_tts_tpu.audio.mel.mel_spectrogram
numerically (tested via interpret mode) and dispatches to the plain XLA
implementation off-TPU.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torch_tts_tpu.audio.mel import hann_window, mel_filterbank


@functools.lru_cache(maxsize=8)
def _dft_matrices(n_fft: int):
    """Real-DFT basis: frame @ C -> Re, frame @ S -> Im, each [n_fft, F]."""
    F = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(F)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _stft_mel_kernel(frames_ref, win_ref, cos_ref, sin_ref, mel_ref, out_ref):
    w = frames_ref[:] * win_ref[:]  # [T_blk, n_fft]
    re = jnp.dot(w, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(w, sin_ref[:], preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im + 1e-6)  # [T_blk, F]
    mel = jnp.dot(mag, mel_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log(jnp.clip(mel, min=1e-5))


def mel_spectrogram_fused(
    y: jax.Array,
    n_fft: int,
    n_mels: int,
    sampling_rate: int,
    hop_length: int,
    win_length: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    block_frames: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """[B, L] waveform -> [B, T, n_mels] log-mel via the fused kernel."""
    assert win_length == n_fft
    squeeze = y.ndim == 1
    if squeeze:
        y = y[None]
    B = y.shape[0]
    pad = int((n_fft - hop_length) / 2)
    yp = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (yp.shape[-1] - n_fft) // hop_length
    idx = np.arange(n_fft)[None, :] + hop_length * np.arange(n_frames)[:, None]
    frames = yp[:, idx].reshape(B * n_frames, n_fft)

    # pad the frame axis to a block multiple
    total = frames.shape[0]
    padded = ((total + block_frames - 1) // block_frames) * block_frames
    if padded != total:
        frames = jnp.pad(frames, ((0, padded - total), (0, 0)))

    cos_m, sin_m = _dft_matrices(n_fft)
    basis = mel_filterbank(sampling_rate, n_fft, n_mels, fmin, fmax).T  # [F, M]
    window = hann_window(win_length)

    grid = (padded // block_frames,)
    out = pl.pallas_call(
        _stft_mel_kernel,
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_frames, n_fft), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_fft), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_fft, cos_m.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_fft, sin_m.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((basis.shape[0], n_mels), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_frames, n_mels), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((padded, n_mels), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * padded * n_fft * (2 * cos_m.shape[1] + n_mels),
            bytes_accessed=4 * padded * (n_fft + n_mels),
            transcendentals=padded * n_mels,
        ),
    )(
        frames.astype(jnp.float32),
        jnp.asarray(window)[None, :],
        jnp.asarray(cos_m),
        jnp.asarray(sin_m),
        jnp.asarray(basis),
    )
    out = out[:total].reshape(B, n_frames, n_mels)
    return out[0] if squeeze else out


def mel_spectrogram_auto(y, n_fft, n_mels, sampling_rate, hop_length,
                         win_length, fmin=0.0, fmax=None):
    """Shape-aware dispatch, settled by on-chip A/B (BASELINE.md):

    the fused kernel wins ~17% at bulk-extraction shapes (thousands of
    frames, MXU-bound) but loses ~16% at the train step's tiny y_hat_mel
    slice (264 frames — grid too small to amortize kernel launch/pipelining).
    Dispatch to the kernel only on TPU at >= 2048 total frames; XLA (rfft)
    otherwise.
    """
    from torch_tts_tpu.audio import mel as melmod

    B = 1 if y.ndim == 1 else y.shape[0]
    n_frames = B * (1 + y.shape[-1] // hop_length)
    if jax.default_backend() == "tpu" and n_frames >= 2048:
        return mel_spectrogram_fused(
            y, n_fft, n_mels, sampling_rate, hop_length, win_length, fmin, fmax
        )
    return melmod.mel_spectrogram(
        y, n_fft, n_mels, sampling_rate, hop_length, win_length, fmin, fmax
    )
