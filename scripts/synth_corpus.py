"""Synthetic speech-like corpus for long-horizon quality runs.

The image has no real speech corpus (zero egress), so the largest corpus
constructible in-image is synthetic. Unlike train_smoke's pure sine tones,
this generator produces *speech-shaped* audio the full VITS2 pipeline has to
genuinely model:

- "vowels"  : two-formant harmonic stacks on a declining F0 contour
              (per-utterance F0 base jitter, per-symbol formant targets),
- "fricatives": band-shaped noise (symbol-specific spectral tilt),
- "stops"   : closure silence + release burst,
- "nasals"  : low-frequency murmur (F0 + weak 2nd harmonic),
- word structure: symbols grouped into words separated by spaces (so the
  text stream has the blank/space statistics MAS + the duration predictor
  see in real data), per-symbol random durations (vowels long, stops short),
  amplitude envelopes, and a light noise floor.

Deterministic per (seed, index): the corpus is reproducible from the recipe
(artifacts/README.md) without committing audio to git.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

SR = 22050
HOP = 256

VOWELS = {
    # symbol: (F1, F2) formant-ish pair in Hz
    "a": (730, 1090), "e": (530, 1840), "i": (390, 1990),
    "o": (570, 840), "u": (440, 1020), "y": (490, 1350),
}
FRICATIVES = {
    # symbol: (band_lo, band_hi) noise band in Hz
    "s": (4000, 8000), "f": (1500, 5000), "h": (500, 2500), "z": (3000, 7000),
}
STOPS = ("p", "t", "k", "b", "d", "g")
NASALS = {"m": 250.0, "n": 320.0, "l": 380.0, "r": 420.0}

ALL_SYMBOLS = (
    list(VOWELS) + list(FRICATIVES) + list(STOPS) + list(NASALS)
)


def _vowel(f0: float, formants: Tuple[float, float], n: int,
           rng: np.random.Generator) -> np.ndarray:
    t = np.arange(n) / SR
    f1, f2 = formants
    # harmonic stack: strongest harmonics near the two formants
    sig = np.zeros(n)
    for k in range(1, 18):
        fk = k * f0
        if fk > SR / 2 - 500:
            break
        amp = 0.2 / (1 + abs(fk - f1) / 200.0) + 0.12 / (1 + abs(fk - f2) / 300.0)
        sig += amp * np.sin(2 * np.pi * fk * t + rng.uniform(0, 2 * np.pi))
    return sig


def _noise_band(lo: float, hi: float, n: int,
                rng: np.random.Generator) -> np.ndarray:
    white = rng.standard_normal(n + 256)
    spec = np.fft.rfft(white)
    freqs = np.fft.rfftfreq(len(white), 1 / SR)
    mask = ((freqs >= lo) & (freqs <= hi)).astype(float)
    # soft band edges
    mask = np.convolve(mask, np.hanning(9) / np.hanning(9).sum(), mode="same")
    shaped = np.fft.irfft(spec * mask)[:n]
    m = np.max(np.abs(shaped)) + 1e-9
    return 0.35 * shaped / m


def _segment(sym: str, f0: float, frames: int,
             rng: np.random.Generator) -> np.ndarray:
    n = frames * HOP
    if sym in VOWELS:
        sig = _vowel(f0, VOWELS[sym], n, rng)
    elif sym in FRICATIVES:
        lo, hi = FRICATIVES[sym]
        sig = _noise_band(lo, hi, n, rng)
    elif sym in STOPS:
        sig = np.zeros(n)
        burst = _noise_band(800, 6000, min(n, HOP), rng)
        sig[n - len(burst):] = burst * 1.4  # closure then release
    else:  # nasal
        t = np.arange(n) / SR
        base = NASALS[sym]
        sig = 0.5 * np.sin(2 * np.pi * base * t) \
            + 0.15 * np.sin(2 * np.pi * 2 * base * t)
    # attack/decay envelope (soft transitions between segments)
    env = np.ones(n)
    a = min(n // 4, HOP // 2)
    if a > 0:
        env[:a] = np.linspace(0, 1, a)
        env[-a:] = np.linspace(1, 0, a)
    return sig * env


def synth_utterance(text: str, rng: np.random.Generator) -> np.ndarray:
    """text: words of corpus symbols separated by spaces."""
    f0_base = rng.uniform(200.0, 235.0)
    syms = list(text)
    total = sum(1 for s in syms)
    pieces: List[np.ndarray] = []
    pos = 0
    for s in syms:
        # F0 declination across the utterance
        f0 = f0_base * (1.0 - 0.18 * pos / max(1, total - 1))
        if s == " ":
            pieces.append(np.zeros(int(rng.integers(2, 4)) * HOP))
        elif s in VOWELS:
            pieces.append(_segment(s, f0, int(rng.integers(4, 9)), rng))
        elif s in STOPS:
            pieces.append(_segment(s, f0, int(rng.integers(2, 4)), rng))
        else:
            pieces.append(_segment(s, f0, int(rng.integers(3, 6)), rng))
        pos += 1
    wav = np.concatenate(pieces)
    wav = wav + 0.003 * rng.standard_normal(len(wav))  # noise floor
    peak = np.max(np.abs(wav)) + 1e-9
    return (0.6 * wav / peak).astype(np.float32)


def random_text(rng: np.random.Generator, n_words: Tuple[int, int] = (3, 8)) -> str:
    words = []
    for _ in range(int(rng.integers(*n_words))):
        L = int(rng.integers(2, 6))
        # CV-ish alternation: vowels more likely after consonants
        syms = []
        prev_vowel = bool(rng.integers(0, 2))
        for _ in range(L):
            pool = (
                list(FRICATIVES) + list(STOPS) + list(NASALS)
                if prev_vowel else list(VOWELS)
            )
            s = pool[int(rng.integers(0, len(pool)))]
            syms.append(s)
            prev_vowel = s in VOWELS
        words.append("".join(syms))
    return " ".join(words)


def build(root: str, n_train: int = 360, n_eval: int = 24,
          seed: int = 0) -> Tuple[str, str]:
    """Build the corpus; returns (train_filelist, eval_filelist) paths."""
    from scipy.io import wavfile

    wav_dir = os.path.join(root, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    lines = []
    for u in range(n_train + n_eval):
        text = random_text(rng)
        wav = synth_utterance(text, rng)
        path = os.path.join(wav_dir, f"q{u:04d}.wav")
        if not os.path.exists(path):
            wavfile.write(path, SR, (wav * 32767).astype(np.int16))
        lines.append(f"{path}|{text}")
    train_fl = os.path.join(root, "filelist_train.txt")
    eval_fl = os.path.join(root, "filelist_eval.txt")
    with open(train_fl, "w") as f:
        f.write("\n".join(lines[:n_train]) + "\n")
    with open(eval_fl, "w") as f:
        f.write("\n".join(lines[n_train:]) + "\n")
    return train_fl, eval_fl
