"""ctypes binding for the native runtime (csrc/ -> libttsrt.so).

Gives the data pipeline a C++ fast path: WAV decode, OpenMP mel extraction,
and a multi-threaded prefetching batcher, without pybind11 (not in this
image). Falls back cleanly when the library isn't built — call
`scripts/build_native.sh` to build it.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB = None
_SEARCH = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "build-csrc", "libttsrt.so"),
    "libttsrt.so",
]


def load_library(path: Optional[str] = None):
    global _LIB
    if _LIB is not None:
        return _LIB
    candidates = [path] if path else _SEARCH
    for c in candidates:
        if c and os.path.exists(c):
            lib = ctypes.CDLL(c)
            _setup(lib)
            _LIB = lib
            return lib
    raise FileNotFoundError(
        "libttsrt.so not found — run scripts/build_native.sh first"
    )


def available() -> bool:
    try:
        load_library()
        return True
    except FileNotFoundError:
        return False


def _setup(lib):
    c = ctypes
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.ttsrt_read_wav_info.argtypes = [c.c_char_p, c.POINTER(c.c_int),
                                        c.POINTER(c.c_int64)]
    lib.ttsrt_read_wav.argtypes = [c.c_char_p, f32p, c.c_int64]
    lib.ttsrt_write_wav16.argtypes = [c.c_char_p, f32p, c.c_int64, c.c_int]
    lib.ttsrt_mel_create.restype = c.c_void_p
    lib.ttsrt_mel_create.argtypes = [c.c_int] * 4 + [c.c_float, c.c_float]
    lib.ttsrt_mel_destroy.argtypes = [c.c_void_p]
    lib.ttsrt_mel_num_frames.argtypes = [c.c_void_p, c.c_int64]
    lib.ttsrt_mel_extract.argtypes = [c.c_void_p, f32p, c.c_int64, f32p]
    lib.ttsrt_batcher_create.restype = c.c_void_p
    lib.ttsrt_batcher_create.argtypes = [c.c_int] * 4 + [c.c_float, c.c_float] + [c.c_int] * 4
    lib.ttsrt_batcher_destroy.argtypes = [c.c_void_p]
    lib.ttsrt_batcher_add_item.argtypes = [c.c_void_p, c.c_char_p, i32p, c.c_int]
    lib.ttsrt_batcher_submit.argtypes = [c.c_void_p, i32p, c.c_int]
    lib.ttsrt_batcher_next.argtypes = [c.c_void_p, i32p, i32p, f32p, i32p, f32p, i32p]
    lib.ttsrt_batcher_stop.argtypes = [c.c_void_p]
    lib.ttsrt_lltm_forward.argtypes = [f32p] * 5 + [ctypes.c_int] * 3 + [f32p] * 3
    lib.ttsrt_lltm_backward.argtypes = [f32p] * 7 + [ctypes.c_int] * 3 + [f32p] * 5


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    lib = load_library()
    sr = ctypes.c_int()
    n = ctypes.c_int64()
    if lib.ttsrt_read_wav_info(path.encode(), ctypes.byref(sr), ctypes.byref(n)) != 0:
        raise IOError(f"cannot read {path}")
    out = np.empty(n.value, np.float32)
    got = lib.ttsrt_read_wav(path.encode(), out, n.value)
    return out[:got], sr.value


def write_wav16(path: str, samples: np.ndarray, sample_rate: int) -> None:
    lib = load_library()
    s = np.ascontiguousarray(samples, np.float32)
    if lib.ttsrt_write_wav16(path.encode(), s, len(s), sample_rate) != 0:
        raise IOError(f"cannot write {path}")


class NativeMel:
    def __init__(self, sample_rate, n_fft, hop, n_mels, fmin=0.0, fmax=0.0):
        self.lib = load_library()
        self.h = self.lib.ttsrt_mel_create(
            sample_rate, n_fft, hop, n_mels, fmin, fmax or 0.0
        )
        self.n_mels = n_mels

    def __del__(self):
        if getattr(self, "h", None):
            self.lib.ttsrt_mel_destroy(self.h)
            self.h = None

    def extract(self, wav: np.ndarray) -> np.ndarray:
        wav = np.ascontiguousarray(wav, np.float32)
        frames = self.lib.ttsrt_mel_num_frames(self.h, len(wav))
        out = np.empty((frames, self.n_mels), np.float32)
        self.lib.ttsrt_mel_extract(self.h, wav, len(wav), out)
        return out


class NativeBatcher:
    """Prefetching batcher over (wav_path, text_ids) items."""

    def __init__(self, audio_cfg, batch_size: int, pad_frames: int,
                 pad_text: int, num_workers: int = 4):
        self.lib = load_library()
        self.B = batch_size
        self.PF = pad_frames
        self.PT = pad_text
        self.M = audio_cfg.n_mel_channels
        self.hop = audio_cfg.hop_length
        self.h = self.lib.ttsrt_batcher_create(
            audio_cfg.sampling_rate, audio_cfg.filter_length,
            audio_cfg.hop_length, audio_cfg.n_mel_channels,
            audio_cfg.mel_fmin, audio_cfg.mel_fmax or 0.0,
            batch_size, pad_frames, pad_text, num_workers,
        )

    def __del__(self):
        if getattr(self, "h", None):
            self.lib.ttsrt_batcher_destroy(self.h)
            self.h = None

    def add_item(self, wav_path: str, text_ids: Sequence[int]) -> None:
        ids = np.ascontiguousarray(text_ids, np.int32)
        self.lib.ttsrt_batcher_add_item(self.h, wav_path.encode(), ids, len(ids))

    def submit(self, indices: Sequence[int]) -> None:
        idx = np.ascontiguousarray(indices, np.int32)
        self.lib.ttsrt_batcher_submit(self.h, idx, len(idx))

    def next_batch(self):
        B, PF, PT, M, hop = self.B, self.PF, self.PT, self.M, self.hop
        text = np.empty((B, PT), np.int32)
        text_len = np.empty((B,), np.int32)
        mel = np.empty((B, PF, M), np.float32)
        mel_len = np.empty((B,), np.int32)
        wav = np.empty((B, PF * hop), np.float32)
        wav_len = np.empty((B,), np.int32)
        rc = self.lib.ttsrt_batcher_next(self.h, text, text_len, mel, mel_len,
                                         wav, wav_len)
        if rc != 0:
            return None
        return {
            "x": text, "x_lengths": text_len,
            "spec": mel, "spec_lengths": mel_len,
            "wav": wav[..., None], "wav_lengths": wav_len,
        }

    def stop(self):
        self.lib.ttsrt_batcher_stop(self.h)


def lltm_forward_native(x, w, b, old_h, old_c):
    lib = load_library()
    B, I = x.shape
    H = old_h.shape[1]
    new_h = np.empty((B, H), np.float32)
    new_c = np.empty((B, H), np.float32)
    gates = np.empty((B, 3 * H), np.float32)
    lib.ttsrt_lltm_forward(
        np.ascontiguousarray(x, np.float32), np.ascontiguousarray(w, np.float32),
        np.ascontiguousarray(b, np.float32), np.ascontiguousarray(old_h, np.float32),
        np.ascontiguousarray(old_c, np.float32), B, I, H, new_h, new_c, gates,
    )
    return new_h, new_c, gates


def lltm_backward_native(grad_h, grad_c, new_c, gates, w, x, old_h):
    lib = load_library()
    B, I = x.shape
    H = old_h.shape[1]
    d_x = np.empty((B, I), np.float32)
    d_w = np.empty_like(np.ascontiguousarray(w, np.float32))
    d_b = np.empty((3 * H,), np.float32)
    d_old_h = np.empty((B, H), np.float32)
    d_old_c = np.empty((B, H), np.float32)
    lib.ttsrt_lltm_backward(
        np.ascontiguousarray(grad_h, np.float32),
        np.ascontiguousarray(grad_c, np.float32),
        np.ascontiguousarray(new_c, np.float32),
        np.ascontiguousarray(gates, np.float32),
        np.ascontiguousarray(w, np.float32),
        np.ascontiguousarray(x, np.float32),
        np.ascontiguousarray(old_h, np.float32),
        B, I, H, d_x, d_w, d_b, d_old_h, d_old_c,
    )
    return d_x, d_w, d_b, d_old_h, d_old_c
