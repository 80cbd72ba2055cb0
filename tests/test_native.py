"""Native runtime (csrc/libttsrt.so): WAV IO round-trip, C++ mel extraction
parity vs the numpy/jax frontends, prefetching batcher, and the C++ LLTM
oracle vs the Pallas/jnp gated cell. Skipped when the library isn't built."""

import os
import subprocess

import numpy as np
import pytest
from scipy.io import wavfile

from torch_tts_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libttsrt.so not built (scripts/build_native.sh)"
)


def test_wav_roundtrip(tmp_path, rng):
    y = np.clip(rng.standard_normal(8000) * 0.3, -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "t.wav")
    native.write_wav16(p, y, 16000)
    back, sr = native.read_wav(p)
    assert sr == 16000
    assert len(back) == len(y)
    # 16-bit truncation + 32767/32768 scale: ~1e-4 worst case
    np.testing.assert_allclose(back, y, atol=1.5e-4)

    # scipy-written PCM16 reads identically
    p2 = str(tmp_path / "t2.wav")
    wavfile.write(p2, 22050, (y * 32767).astype(np.int16))
    b2, sr2 = native.read_wav(p2)
    assert sr2 == 22050
    np.testing.assert_allclose(b2, y, atol=1.5e-4)


def test_native_mel_matches_numpy(rng):
    from torch_tts_tpu.data import audio_np

    y = (rng.standard_normal(16384) * 0.4).astype(np.float32)
    m = native.NativeMel(22050, 1024, 256, 80, 0.0, 0.0)
    ours = m.extract(y)
    ref = audio_np.mel_spectrogram_np(y, 1024, 80, 22050, 256, 1024)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_native_batcher(tmp_path, rng):
    from torch_tts_tpu.core.config import AudioConfig

    cfg = AudioConfig(sampling_rate=8000, filter_length=256, hop_length=64,
                      win_length=256, n_mel_channels=20)
    paths = []
    for i in range(4):
        y = (rng.standard_normal(64 * (10 + i)) * 0.2 * 32767).astype(np.int16)
        p = str(tmp_path / f"b{i}.wav")
        wavfile.write(p, 8000, y)
        paths.append(p)

    b = native.NativeBatcher(cfg, batch_size=2, pad_frames=16, pad_text=8,
                             num_workers=2)
    for i, p in enumerate(paths):
        b.add_item(p, [1, 2, 3, i + 1])
    b.submit([0, 1])
    b.submit([2, 3])
    batch1 = b.next_batch()
    batch2 = b.next_batch()
    b.stop()
    assert batch1 is not None and batch2 is not None
    assert batch1["x"].shape == (2, 8)
    assert batch1["spec"].shape == (2, 16, 20)
    assert batch1["wav"].shape == (2, 16 * 64, 1)
    assert batch1["x_lengths"].tolist() == [4, 4]
    assert all(batch1["spec_lengths"] > 0)

    # mel content parity — identify which item row 0 of batch1 holds by its
    # last text id (batch completion order is nondeterministic with 2 workers)
    item_idx = int(batch1["x"][0, 3]) - 1
    m = native.NativeMel(8000, 256, 64, 20)
    wav0, sr = native.read_wav(paths[item_idx])
    frames = min(16, len(wav0) // 64)
    direct = m.extract(wav0[: frames * 64])
    np.testing.assert_allclose(batch1["spec"][0, :frames], direct, rtol=1e-5)


def test_native_lltm_matches_python(rng):
    from torch_tts_tpu.kernels.gated_cell import lltm_ref, _lltm_vjp_fwd, _lltm_vjp_bwd
    import jax.numpy as jnp

    B, I, H = 3, 5, 6
    x = rng.standard_normal((B, I)).astype(np.float32)
    w = (rng.standard_normal((3 * H, H + I)) * 0.3).astype(np.float32)
    b = (rng.standard_normal(3 * H) * 0.1).astype(np.float32)
    h = rng.standard_normal((B, H)).astype(np.float32)
    c = rng.standard_normal((B, H)).astype(np.float32)

    nh, nc, gates = native.lltm_forward_native(x, w, b, h, c)
    rh, rc = lltm_ref(*map(jnp.asarray, (x, w, b, h, c)))
    np.testing.assert_allclose(nh, np.asarray(rh), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(nc, np.asarray(rc), rtol=1e-4, atol=1e-5)

    gh = rng.standard_normal((B, H)).astype(np.float32)
    gc = rng.standard_normal((B, H)).astype(np.float32)
    d_native = native.lltm_backward_native(gh, gc, nc, gates, w, x, h)

    _, res = _lltm_vjp_fwd(*map(jnp.asarray, (x, w, b, h, c)))
    d_jax = _lltm_vjp_bwd(res, (jnp.asarray(gh), jnp.asarray(gc)))
    for a, bj in zip(d_native, d_jax):
        np.testing.assert_allclose(a, np.asarray(bj), rtol=1e-3, atol=1e-4)


def test_ttsb_roundtrip(tmp_path, rng):
    from torch_tts_tpu.infer.artifacts import read_ttsb, write_ttsb

    tensors = [
        rng.standard_normal((3, 4)).astype(np.float32),
        rng.integers(0, 100, (7,)).astype(np.int32),
        np.float32(rng.standard_normal((2, 3, 5))),
    ]
    p = str(tmp_path / "t.ttsb")
    write_ttsb(p, tensors)
    back = read_ttsb(p)
    assert len(back) == 3
    for a, b in zip(tensors, back):
        np.testing.assert_array_equal(a, b)
        assert a.dtype == b.dtype
