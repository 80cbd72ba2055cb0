"""A/B: fused Pallas STFT+mel kernel vs the XLA (rfft) mel path, real chip.

Settles VERDICT r1 weak-#3: is kernels/stft.py a measured win anywhere?
Measured at the two shapes that matter:
  - train-step y_hat_mel: batch 8 x 8192 samples (32 frames each)
  - bulk frontend extraction: batch 8 x 10 s of 22.05 kHz audio

Timing uses a 20-call dependent chain with one final scalar fetch (the
tunnel's block_until_ready does not await; see CLAUDE.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time_chain(fn, y0, n=20):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(y):
        m = fn(y)
        s = jnp.sum(m)
        # feed a checksum-dependent perturbation back so calls chain
        return y + (s * 0).astype(y.dtype), s

    y = y0
    y, s = step(y)
    float(np.asarray(s))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(n):
        y, s = step(y)
    float(np.asarray(s))
    return (time.perf_counter() - t0) / n


def main():
    import jax

    from torch_tts_tpu.audio import mel as melmod
    from torch_tts_tpu.kernels.stft import mel_spectrogram_fused

    n_fft, hop, win, n_mels, sr = 1024, 256, 1024, 80, 22050
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    for name, B, L in [("train y_hat_mel", 8, 8192), ("bulk 10s", 8, 220500)]:
        y = jax.numpy.asarray(
            (rng.standard_normal((B, L)) * 0.1).astype(np.float32)
        )
        xla = _time_chain(
            lambda yy: melmod.mel_spectrogram(yy, n_fft, n_mels, sr, hop, win), y
        )
        fused = _time_chain(
            lambda yy: mel_spectrogram_fused(yy, n_fft, n_mels, sr, hop, win), y
        )
        frames = B * (1 + L // hop)
        print(
            f"{name}: XLA {xla*1e3:.3f} ms vs fused {fused*1e3:.3f} ms "
            f"({frames} frames; {'FUSED WINS' if fused < xla else 'XLA WINS'} "
            f"by {abs(xla-fused)/max(xla,fused)*100:.0f}%)"
        )


if __name__ == "__main__":
    main()
