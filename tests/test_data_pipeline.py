"""Data layer: numpy-vs-jax frontend parity, wav IO, dataset caching,
bucket samplers, static-shape collation."""

import os

import numpy as np
import pytest
from scipy.io import wavfile

import jax.numpy as jnp

from torch_tts_tpu.audio import mel as jmel
from torch_tts_tpu.core.config import AudioConfig, DataConfig
from torch_tts_tpu.data import audio_np
from torch_tts_tpu.data.dataset import Item, TextAudioDataset, collate_batch
from torch_tts_tpu.data.sampler import DistributedBucketSampler, LengthBucketRandomSampler


def test_np_mel_matches_jax(rng):
    y = (rng.standard_normal(8192) * 0.2).astype(np.float32)
    ours_np = audio_np.mel_spectrogram_np(y, 1024, 80, 22050, 256, 1024)
    ours_jax = np.asarray(jmel.mel_spectrogram(jnp.asarray(y), 1024, 80, 22050, 256, 1024))
    np.testing.assert_allclose(ours_np, ours_jax, rtol=1e-3, atol=1e-4)


def make_wav_dataset(tmp_path, rng, n=12, sr=22050):
    wavs = tmp_path / "wavs"
    wavs.mkdir()
    items = []
    for i in range(n):
        dur = int(sr * (0.3 + 0.1 * (i % 5)))
        data = (rng.standard_normal(dur) * 3000).astype(np.int16)
        path = str(wavs / f"utt{i}.wav")
        wavfile.write(path, sr, data)
        items.append(Item(f"utt{i}", path, "hello world " + "a" * i))
    return items


def test_dataset_features_and_cache(tmp_path, rng):
    items = make_wav_dataset(tmp_path, rng)
    audio = AudioConfig(sampling_rate=22050)
    data = DataConfig(text_cleaners=("basic_cleaners",), add_blank=True)
    ds = TextAudioDataset(items, audio, data, use_mel=True)
    assert len(ds) == 12
    s = ds[0]
    assert s["spec"].shape[1] == 80
    assert len(s["wav"]) == s["spec"].shape[0] * 256
    assert s["x"][0] == 0 and s["x"][-1] == 0  # interspersed blanks
    # cache file created and reused
    assert os.path.exists(items[0].audio_path + ".mel.npy")
    s2 = ds[0]
    np.testing.assert_array_equal(s["spec"], s2["spec"])


def test_collate_static_shapes(tmp_path, rng):
    items = make_wav_dataset(tmp_path, rng)
    audio = AudioConfig(sampling_rate=22050)
    data = DataConfig(text_cleaners=("basic_cleaners",))
    ds = TextAudioDataset(items, audio, data)
    batch = collate_batch([ds[0], ds[1], ds[4]], pad_text_to=64, pad_frames_to=80)
    assert batch["x"].shape == (3, 64)
    assert batch["spec"].shape == (3, 80, 80)
    assert batch["wav"].shape == (3, 80 * 256, 1)
    assert batch["spec_lengths"].max() <= 80


def test_distributed_bucket_sampler_partitions():
    lengths = [50, 60, 70, 120, 130, 140, 150, 400, 410, 420, 430, 440]
    boundaries = [32, 100, 300, 500]
    # two replicas must see disjoint, complete coverage per epoch
    all_idx = []
    for rank in range(2):
        s = DistributedBucketSampler(
            lengths, batch_size=2, boundaries=boundaries,
            num_replicas=2, rank=rank, shuffle=True,
        )
        s.set_epoch(3)
        batches = list(s)
        for pad_frames, batch in batches:
            assert len(batch) == 2
            for idx in batch:
                assert lengths[idx] <= pad_frames  # static shape covers items
            all_idx.extend(batch)
    # oversampling pads to divisibility, so >= once each
    assert set(all_idx) == set(range(len(lengths)))

    # same epoch -> deterministic
    s2 = DistributedBucketSampler(
        lengths, 2, [32, 100, 300, 500], num_replicas=2, rank=0
    )
    s2.set_epoch(3)
    s3 = DistributedBucketSampler(
        lengths, 2, [32, 100, 300, 500], num_replicas=2, rank=0
    )
    s3.set_epoch(3)
    assert [b for _, b in s2] == [b for _, b in s3]


def test_bucket_sampler_drops_out_of_range():
    lengths = [10, 50, 2000]
    s = DistributedBucketSampler(lengths, 1, [32, 100, 1000])
    seen = [i for _, b in s for i in b]
    assert 0 not in seen and 2 not in seen and 1 in seen


def test_tacotron_length_bucket_sampler():
    lengths = list(range(100))
    s = LengthBucketRandomSampler(lengths, batch_size=4, bucket_size_mult=2, seed=0)
    batches = list(s)
    assert sum(len(b) for b in batches) == 100
    # within a batch, lengths are close (bucketing)
    for b in batches:
        vals = [lengths[i] for i in b]
        assert max(vals) - min(vals) <= 8


def test_concat_datasets_sid_offset(tmp_path, rng):
    """ConcatDataset parity (/root/reference/vits2/cli.py:92-100) plus the
    per-corpus speaker-id offsetting the multi-corpus CLI uses."""
    audio = AudioConfig(sampling_rate=22050)
    data = DataConfig(text_cleaners=("basic_cleaners",))
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    items_a = make_wav_dataset(tmp_path / "a", rng, n=5)
    items_b = make_wav_dataset(tmp_path / "b", rng, n=4)
    for i, it in enumerate(items_a):
        it.sid = i % 2  # corpus A has speakers {0, 1}
    ds_a = TextAudioDataset(items_a, audio, data)
    ds_b = TextAudioDataset(items_b, audio, data)  # all sid 0

    plain = TextAudioDataset.concat([ds_a, ds_b], audio, data)
    assert len(plain) == 9
    assert [it.sid for it in plain.items] == [0, 1, 0, 1, 0, 0, 0, 0, 0]
    # lengths table spans both corpora (bucketing sees one corpus)
    assert plain.lengths == ds_a.lengths + ds_b.lengths

    off = TextAudioDataset.concat([ds_a, ds_b], audio, data, sid_offset=True)
    # corpus B's speaker 0 is shifted above corpus A's max (1) -> 2
    assert [it.sid for it in off.items] == [0, 1, 0, 1, 0, 2, 2, 2, 2]
    # items are copies: the source datasets are untouched
    assert [it.sid for it in ds_b.items] == [0, 0, 0, 0]
    # features still load through the concatenated view
    s = off[5]
    assert int(s["sid"]) == 2 and s["spec"].shape[1] == 80


def test_concat_buckets_mix_corpora(tmp_path, rng):
    """Bucketed batches must interleave corpora, not iterate them serially —
    both corpora have the same length profile, so every bucket should draw
    from both."""
    audio = AudioConfig(sampling_rate=22050)
    data = DataConfig(text_cleaners=("basic_cleaners",))
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    ds_a = TextAudioDataset(make_wav_dataset(tmp_path / "a", rng, n=10), audio, data)
    ds_b = TextAudioDataset(make_wav_dataset(tmp_path / "b", rng, n=10), audio, data)
    both = TextAudioDataset.concat([ds_a, ds_b], audio, data)

    s = DistributedBucketSampler(
        both.lengths, batch_size=4, boundaries=[1, 200], num_replicas=1,
        rank=0, shuffle=True,
    )
    s.set_epoch(0)
    mixed = 0
    for _pad, batch in s:
        from_a = sum(1 for i in batch if i < 10)
        mixed += 1 if 0 < from_a < len(batch) else 0
    assert mixed >= 2  # most batches mix corpora
