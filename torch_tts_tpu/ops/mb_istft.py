"""Multi-band iSTFT generator — the lightweight decoder from
MB-iSTFT-VITS (arXiv:2210.15975): replace the last HiFi-GAN upsampling
stages with (a) an iSTFT head that synthesizes each sub-band from predicted
magnitude/phase frames and (b) a fixed PQMF synthesis filterbank that merges
the sub-bands. For the LJSpeech hop of 256:

    HiFi-GAN:  frames -(x8)-(x8)-(x2)-(x2)-> samples        (conv everywhere)
    MB-iSTFT:  frames -(x4)-(x4)-> iSTFT(x4) -> PQMF(x4) -> samples

so the transposed-conv/resblock stack only runs at 1/16 of the audio rate —
~4x fewer decoder FLOPs and, on TPU, far fewer bandwidth-bound narrow convs
(the very stages BASELINE.md identifies as the MFU ceiling). Everything else
(posterior, flows, durations, discriminators, losses, training step) is
unchanged; select with `model.decoder_type: mb_istft` in the config.

No reference counterpart (kgoba/torch-tts ships only the conv HiFi-GAN,
vits2/models.py:900); this is a beyond-parity speed option. The iSTFT is
real WOLA (hann, center-style) and the PQMF is the standard cosine-modulated
near-perfect-reconstruction bank (Kaiser prototype), validated by an
analysis->synthesis round-trip test.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from torch_tts_tpu.ops.hifigan import ResBlock1, ResBlock2
from torch_tts_tpu.ops.layers import Conv1d, ConvTranspose1d, leaky_relu


# ---------------------------------------------------------------------------
# PQMF — pseudo-quadrature mirror filterbank (fixed, not learned)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _pqmf_filters(subbands: int, taps: int, cutoff: float, beta: float):
    """Analysis/synthesis filter banks, [taps+1, S] each (numpy, cached)."""
    from scipy.signal import firwin

    h = firwin(taps + 1, cutoff, window=("kaiser", beta))
    n = np.arange(taps + 1)
    H = np.zeros((taps + 1, subbands))
    G = np.zeros((taps + 1, subbands))
    for k in range(subbands):
        arg = (2 * k + 1) * np.pi / (2 * subbands) * (n - taps / 2)
        phi = (-1) ** k * np.pi / 4
        H[:, k] = 2 * h * np.cos(arg + phi)
        G[:, k] = 2 * h * np.cos(arg - phi)
    return H.astype(np.float32), G.astype(np.float32)


class PQMF:
    """S-band cosine-modulated filterbank (near-perfect reconstruction).

    analysis:  [B, L, 1] -> [B, L/S, S]   (filter + decimate)
    synthesis: [B, L/S, S] -> [B, L, 1]   (interpolate + filter + sum)

    Round trip reconstructs the input delayed by `taps` samples (verified to
    >35 dB SNR in tests/test_mb_istft.py).
    """

    def __init__(self, subbands: int = 4, taps: int = 62,
                 cutoff: float = 0.142, beta: float = 9.0):
        self.subbands = subbands
        self.taps = taps
        H, G = _pqmf_filters(subbands, taps, cutoff, beta)
        self.H = jnp.asarray(H)[:, None, :]          # [K, 1, S]
        self.G = jnp.asarray(G * subbands)[:, :, None]  # [K, S, 1]

    def analysis(self, x: jax.Array) -> jax.Array:
        pad = self.taps // 2
        return jax.lax.conv_general_dilated(
            x, self.H.astype(x.dtype),
            window_strides=(self.subbands,),
            padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )

    def synthesis(self, x: jax.Array) -> jax.Array:
        # conv_transpose mirrors the kernel along the spatial axis — which is
        # exactly the orientation the QMF aliasing cancellation needs here:
        # analysis is a (correlation-style) strided conv, so synthesis must
        # apply the time-reversed filters (validated to ~64 dB round-trip
        # SNR at zero delay with the taps//2 trim below)
        y = jax.lax.conv_transpose(
            x, self.G.astype(x.dtype),
            strides=(self.subbands,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        # conv_transpose with VALID padding emits (L-1)*S + taps+1 samples;
        # trim the filter's group delay so len(out) == S * len(in)
        off = self.taps // 2
        return y[:, off : off + x.shape[1] * self.subbands]


# ---------------------------------------------------------------------------
# iSTFT (WOLA) from magnitude + phase frames
# ---------------------------------------------------------------------------


def overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """[B, T, n] frames -> [B, (T-1)*hop + n] via one conv_transpose (the
    identity kernel makes OLA a single MXU-friendly op instead of a scatter).
    """
    n = frames.shape[-1]
    # conv_transpose mirrors the kernel along W: use the anti-diagonal so
    # y[t*hop + k] += frames[t, k]
    eye = jnp.flip(jnp.eye(n, dtype=frames.dtype), axis=0)[:, :, None]
    y = jax.lax.conv_transpose(
        frames, eye, strides=(hop,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y[..., 0]


def inverse_stft(mag: jax.Array, phase: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """[B, T, n_fft//2+1] magnitude/phase -> [B, T*hop] waveform.

    torch.istft semantics (hann, center=True): windowed frames overlap-added
    and normalized by the window-square envelope, then the centering pad of
    n_fft//2 is trimmed from both ends.
    """
    # polar -> rectangular via cos/sin, NOT mag * exp(1j*phase): a bare
    # complex exp dispatched eagerly (outside jit) is UNIMPLEMENTED on the
    # TPU backend, while cos/sin/complex are supported everywhere and XLA
    # fuses them identically under jit.
    ph = phase.astype(mag.dtype)
    spec = jax.lax.complex(mag * jnp.cos(ph), mag * jnp.sin(ph))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1).astype(mag.dtype)
    win = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32), mag.dtype)
    y = overlap_add(frames * win, hop)

    T = frames.shape[1]
    env_frames = jnp.broadcast_to(win * win, (1, T, n_fft))
    env = overlap_add(env_frames, hop)
    y = y / jnp.maximum(env, 1e-9)
    half = n_fft // 2
    # center-style trim; OLA length (T-1)*hop + n_fft >= half + T*hop as long
    # as n_fft - hop >= half (true for the 16/4 default)
    return y[:, half : half + T * hop]


# ---------------------------------------------------------------------------
# the generator
# ---------------------------------------------------------------------------


class MultiBandISTFTGenerator(nn.Module):
    """Drop-in replacement for ops/hifigan.Generator with an iSTFT+PQMF tail.

    [B, T, C_in] latent frames -> [B, T * prod(rates) * istft_hop * subbands, 1]

    The conv trunk (conv_pre, upsample stages, resblocks) mirrors HiFi-GAN;
    the head predicts per-sub-band log-magnitude and phase, synthesizes each
    sub-band with a WOLA iSTFT, and merges them through the fixed PQMF bank.
    Config must satisfy prod(upsample_rates) * istft_hop * subbands ==
    audio hop (256 = 4*4 * 4 * 4 for LJSpeech).

    Masking note: x_mask is threaded through the conv trunk like HiFi-GAN's,
    but the PQMF synthesis filter (62 taps at audio rate) smears ~taps
    samples across the valid-length boundary, so padded-batch outputs are
    only equal to unpadded decoding away from the boundary (the HiFi-GAN
    path is bit-exact). Inference trims to y_lengths, so this only affects
    the final partial frame.
    """

    resblock: str = "1"
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5),
    )
    upsample_rates: Tuple[int, ...] = (4, 4)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16)
    subbands: int = 4
    istft_n_fft: int = 16
    istft_hop: int = 4
    gin_channels: int = 0
    # int8 W8A8 dynamic-quant inference on the conv trunk (ops/quant.py);
    # the iSTFT/PQMF head stays fp (FFT work, quality-sensitive)
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x, g: Optional[jnp.ndarray] = None,
                 x_mask: Optional[jnp.ndarray] = None):
        num_kernels = len(self.resblock_kernel_sizes)
        res_cls = ResBlock1 if self.resblock == "1" else ResBlock2
        q8 = "int8" if self.quant_int8 else None
        if x_mask is not None:
            x = x * x_mask
        x = Conv1d(self.upsample_initial_channel, 7, padding=3, quant=q8,
                   name="conv_pre")(x)
        if g is not None:
            x = x + Conv1d(self.upsample_initial_channel, 1, name="cond")(g)

        mask = x_mask
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = leaky_relu(x)
            if mask is not None:
                x = x * mask
            x = ConvTranspose1d(
                ch, k, stride=u, padding=(k - u) // 2, weight_norm=True,
                quant=q8, name=f"up_{i}",
            )(x)
            if mask is not None:
                mask = jnp.repeat(mask, u, axis=1)
                x = x * mask
            xs = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                block = res_cls(ch, rk, tuple(rd), quant=q8,
                                name=f"resblock_{i}_{j}")
                xs = block(x, mask) if xs is None else xs + block(x, mask)
            x = xs / num_kernels

        x = leaky_relu(x, 0.01)
        if mask is not None:
            x = x * mask
        fbins = self.istft_n_fft // 2 + 1
        h = Conv1d(self.subbands * 2 * fbins, 7, padding=3, name="conv_post")(x)
        B, T, _ = h.shape
        h = h.reshape(B, T, self.subbands, 2 * fbins)
        # [B*S, T, fbins] so one iSTFT covers every sub-band
        h = jnp.swapaxes(h, 1, 2).reshape(B * self.subbands, T, 2 * fbins)
        log_mag, phase = h[..., :fbins], h[..., fbins:]
        mag = jnp.exp(jnp.clip(log_mag, -12.0, 6.0))
        wav = inverse_stft(mag, phase, self.istft_n_fft, self.istft_hop)
        # [B, L_sub, S] sub-band signals -> PQMF merge -> [B, L, 1]
        wav = wav.reshape(B, self.subbands, -1)
        wav = jnp.swapaxes(wav, 1, 2)
        pqmf = PQMF(self.subbands)
        out = pqmf.synthesis(wav)
        if x_mask is not None:
            smask = jnp.repeat(
                mask, self.istft_hop * self.subbands, axis=1
            )
            out = out * smask
        # no output nonlinearity, matching the MB-iSTFT-VITS generator — the
        # mel/adversarial losses bound the amplitude
        return out
