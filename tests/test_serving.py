"""Synthesizer serving API: bucketed batched synthesis, determinism, and
reference-checkpoint ingestion path."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_tts_tpu.core.config import (
    AudioConfig,
    DataConfig,
    VITS2Config,
    VITS2ModelConfig,
    VITS2TrainConfig,
)
from torch_tts_tpu.infer.serving import Synthesizer
from torch_tts_tpu.models.vits2 import SynthesizerTrn

HOP = 64


@pytest.fixture(scope="module")
def synth():
    model_cfg = VITS2ModelConfig(
        inter_channels=16, hidden_channels=16, filter_channels=32, n_heads=2,
        n_layers=1, kernel_size=3, p_dropout=0.1, resblock="2",
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        upsample_rates=(8, 8), upsample_initial_channel=32,
        upsample_kernel_sizes=(16, 16), segment_size=4 * HOP,
    )
    audio = AudioConfig(sampling_rate=8000, filter_length=128, hop_length=HOP,
                        win_length=128, n_mel_channels=20)
    cfg = VITS2Config(
        audio=audio, model=model_cfg, train=VITS2TrainConfig(),
        data=DataConfig(text_cleaners=("basic_cleaners",), add_blank=True),
    )
    from torch_tts_tpu.train.vits2_trainer import build_models
    from torch_tts_tpu.text import symbols

    model, _, _ = build_models(cfg)
    x = jnp.zeros((1, 8), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, x, jnp.asarray([8], jnp.int32), max_frames=16,
                           method=SynthesizerTrn.infer)
    return Synthesizer(cfg, variables["params"],
                       buckets=((16, 24), (80, 96)))


def test_batched_bucketed_synthesis(synth):
    texts = ["hi", "hello there", "a somewhat longer sentence here"]
    results = synth.synthesize(texts, seed=7)
    assert len(results) == 3
    for r in results:
        assert r.sample_rate == 8000
        assert r.audio.ndim == 1 and len(r.audio) > 0
        assert np.all(np.abs(r.audio) <= 1.0)
    # only two executables compiled (one per bucket used)
    assert len(synth._infer_cache) <= 2


def test_transfer_dtype_int16_vs_float32(synth):
    """Default serving transfers 16-bit samples (half the device->host
    bytes — the tunneled-backend bottleneck); audio must equal the float32
    transfer path to half a 16-bit quantum and land exactly on the 16-bit
    grid (so the WAV/PCM surfaces round-trip bit-exactly)."""
    sf = Synthesizer(synth.cfg, synth.params, buckets=synth.buckets,
                     transfer_dtype="float32")
    text = "quantized transfer check"
    a = synth.synthesize([text], seed=3)[0].audio
    b = sf.synthesize([text], seed=3)[0].audio
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=0.5 / 32767 + 1e-7)
    grid = a * 32767.0
    np.testing.assert_allclose(grid, np.round(grid), atol=1e-3)
    with pytest.raises(ValueError):
        Synthesizer(synth.cfg, synth.params, transfer_dtype="int8")


def test_determinism(synth):
    a = synth.synthesize(["hello world"], seed=3)[0].audio
    b = synth.synthesize(["hello world"], seed=3)[0].audio
    c = synth.synthesize(["hello world"], seed=4)[0].audio
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_too_long_raises(synth):
    with pytest.raises(ValueError):
        synth.synthesize(["x " * 200])


def test_attn_return(synth):
    r = synth.synthesize(["hello"], return_attn=True)[0]
    assert r.attn is not None and r.attn.ndim == 2


def test_from_run_dir_with_reference_pth(tmp_path, rng):
    """Synthesizer ingests a torch-saved reference-format G_*.pth end-to-end."""
    import io

    import torch
    import yaml

    from torch_tts_tpu.models.vits2.convert import export_torch_state_dict
    from torch_tts_tpu.train.vits2_trainer import build_models

    # tiny config file the loader can read
    cfg_dict = {
        "data": {
            "text_cleaners": ["basic_cleaners"], "add_blank": True,
            "sampling_rate": 8000, "filter_length": 128, "hop_length": 64,
            "win_length": 128, "n_mel_channels": 20,
        },
        "model": {
            "inter_channels": 16, "hidden_channels": 16, "filter_channels": 32,
            "n_heads": 2, "n_layers": 1, "kernel_size": 3, "p_dropout": 0.1,
            "resblock": "2", "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3]], "upsample_rates": [8, 8],
            "upsample_initial_channel": 32, "upsample_kernel_sizes": [16, 16],
            "segment_size": 256, "use_sdp": True,
            "use_transformer_flows": True, "transformer_flow_type": "pre_conv",
        },
    }
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_dict, f)

    from torch_tts_tpu.core.config import load_vits2_config

    cfg = load_vits2_config(cfg_path)
    model, _, _ = build_models(cfg)
    x = jnp.asarray([[1, 2, 3]], jnp.int32)
    rngs = {"params": jax.random.PRNGKey(7), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, x, jnp.asarray([3], jnp.int32), max_frames=8,
                           method=SynthesizerTrn.infer)
    src_params = jax.device_get(variables["params"])

    # reference-format checkpoint file (vits2/utils.py:48-66 layout)
    sd = export_torch_state_dict(src_params, cfg.model)
    sd_t = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    pth = str(tmp_path / "G_1000.pth")
    torch.save({"model": sd_t, "iteration": 1000, "learning_rate": 2e-4,
                "optimizer": None}, pth)

    synth = Synthesizer.from_run_dir(cfg_path, pth, buckets=((16, 24),))
    # weights made it through: compare one deterministic leaf
    got = np.asarray(synth.params["enc_p"]["emb"]["embedding"])
    np.testing.assert_allclose(
        got, np.asarray(src_params["enc_p"]["emb"]["embedding"]), rtol=1e-6
    )
    r = synth.synthesize(["hello"], seed=1)[0]
    assert len(r.audio) > 0


def test_from_run_dir_average_last(tmp_path, synth):
    """average_last=k loads the mean of the last k generator checkpoints."""
    import yaml

    from torch_tts_tpu.train import checkpoint as ckpt

    cfg_dict = {
        "data": {"text_cleaners": ["basic_cleaners"], "add_blank": True,
                 "sampling_rate": 8000, "filter_length": 128,
                 "hop_length": 64, "win_length": 128, "n_mel_channels": 20},
        "model": {"inter_channels": 16, "hidden_channels": 16,
                  "filter_channels": 32, "n_heads": 2, "n_layers": 1,
                  "kernel_size": 3, "p_dropout": 0.1, "resblock": "2",
                  "resblock_kernel_sizes": [3],
                  "resblock_dilation_sizes": [[1, 3]],
                  "upsample_rates": [8, 8], "upsample_initial_channel": 32,
                  "upsample_kernel_sizes": [16, 16], "segment_size": 256},
    }
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_dict, f)

    base = jax.device_get(synth.params)
    run_dir = str(tmp_path / "run")
    ckpt.save_checkpoint(run_dir, 1, {"params_g": base})
    plus2 = jax.tree.map(lambda a: a + 2.0, base)
    ckpt.save_checkpoint(run_dir, 2, {"params_g": plus2})

    s = Synthesizer.from_run_dir(cfg_path, run_dir, average_last=2,
                                 buckets=((16, 24),))
    got = np.asarray(s.params["enc_p"]["emb"]["embedding"])
    want = np.asarray(base["enc_p"]["emb"]["embedding"]) + 1.0
    np.testing.assert_allclose(got, want, rtol=1e-6)


# ---------------------------------------------------------------------------
# Batch tiers (bounded executable cache) + continuous batching
# ---------------------------------------------------------------------------


def test_batch_tiers_bound_cache(synth):
    """Any traffic pattern maps onto tier batch sizes only — the executable
    cache is bounded at len(batch_tiers) x len(buckets), never one entry per
    observed group size."""
    synth._infer_cache.clear()
    for n in (1, 2, 3, 5, 6, 7):
        texts = ["hello"] * n
        results = synth.synthesize(texts, seed=1)
        assert len(results) == n
    cached_batches = {k[0] for k in synth._infer_cache}
    assert cached_batches <= set(synth.batch_tiers), cached_batches
    assert len(synth._infer_cache) <= len(synth.batch_tiers) * len(synth.buckets)


def test_tier_padding_matches_exact_batch(synth):
    """Padding a 3-request group up to the next tier must not change the
    real rows: a tier-padded group of 3 and a batch of 4 sharing the same
    first three rows (same executable, same per-row noise) must produce
    identical audio for those rows. (Texts are pre-sorted by length so both
    calls assign the same rows; audio DOES depend on batch row index — one
    PRNGKey draws the whole batch's noise — which is why the comparison is
    row-against-row, not batch-against-singles.)"""
    texts3 = ["hi", "yes", "hello"]  # ascending encoded length
    texts4 = texts3 + ["helloo"]  # longest last: sorted order unchanged
    grouped3 = synth.synthesize(texts3, seed=9)  # 3 real + 1 pad row
    grouped4 = synth.synthesize(texts4, seed=9)  # 4 real rows
    for a, b in zip(grouped3, grouped4[:3]):
        assert a.audio.shape == b.audio.shape
        np.testing.assert_allclose(a.audio, b.audio, atol=2e-5)


def test_group_larger_than_max_tier_splits(synth):
    texts = ["hello"] * (synth.max_batch + 3)
    results = synth.synthesize(texts, seed=2)
    assert len(results) == len(texts)
    assert all(len(r.audio) > 0 for r in results)


def test_continuous_batcher_basic(synth):
    """Queued requests resolve with the same audio the offline path gives
    (same group composition + same seed -> same PRNG stream)."""
    from torch_tts_tpu.infer.serving import ContinuousBatcher

    # pre-sorted by encoded length: the batcher (submission order) and the
    # offline path (sorted order) then build the same group rows, so the
    # per-row noise draws coincide
    texts = ["hi", "yes", "hello", "helloo"]
    cb = ContinuousBatcher(synth, autostart=False)
    futs = [cb.submit(t, seed=11) for t in texts]
    cb.start()
    got = [f.result(timeout=120) for f in futs]
    cb.close()

    want = synth.synthesize(texts, seed=11)
    for a, b in zip(got, want):
        assert a.audio.shape == b.audio.shape
        np.testing.assert_allclose(a.audio, b.audio, atol=2e-5)


def test_continuous_batcher_concurrent_submitters(synth):
    import threading

    from torch_tts_tpu.infer.serving import ContinuousBatcher

    results = {}
    with ContinuousBatcher(synth) as cb:
        def worker(i):
            results[i] = cb.submit(f"hello {i}", seed=5).result(timeout=120)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert len(results) == 6
    for r in results.values():
        assert len(r.audio) > 0


def test_continuous_batcher_mixed_scales_dont_merge(synth):
    """Requests with different scale settings land in different dispatch
    groups (scales are per-call scalars) but all resolve."""
    from torch_tts_tpu.infer.serving import ContinuousBatcher

    cb = ContinuousBatcher(synth, autostart=False)
    f1 = cb.submit("hello", noise_scale=0.0, seed=3)
    f2 = cb.submit("hello", noise_scale=0.9, seed=3)
    cb.start()
    a, b = f1.result(timeout=120), f2.result(timeout=120)
    cb.close()
    assert not np.array_equal(a.audio, b.audio)


def test_mesh_sharded_serving_matches_single_device(synth):
    """Passing a Mesh shards every serving dispatch over the data axis.
    Output must match the single-device path: same tier -> same noise draw
    shapes -> same per-row noise, and the model has no cross-batch ops, so
    per-example math is unchanged by the partitioning."""
    from torch_tts_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8, "conftest provides 8 virtual devices"
    buckets = ((16, 24),)
    base = Synthesizer(synth.cfg, synth.params, buckets=buckets,
                       batch_tiers=(8,))
    msynth = Synthesizer(synth.cfg, synth.params, buckets=buckets,
                         batch_tiers=(8,), mesh=make_mesh())
    texts = ["hi", "yes", "hello"]
    a = base.synthesize(texts, seed=11)
    b = msynth.synthesize(texts, seed=11)
    for ra, rb in zip(a, b):
        assert ra.audio.shape == rb.audio.shape and len(ra.audio) > 0
        # one 16-bit transfer quantum (3.05e-5): a float diff at a
        # rounding boundary flips one LSB between the two paths
        np.testing.assert_allclose(ra.audio, rb.audio, atol=3.2e-5)


@pytest.fixture(scope="module")
def ms_setup(synth):
    """Multi-speaker config + params sharing the base fixture's audio/data
    settings."""
    from torch_tts_tpu.train.vits2_trainer import build_models

    cfg = dataclasses.replace(
        synth.cfg,
        model=dataclasses.replace(synth.cfg.model, n_speakers=4,
                                  gin_channels=8),
    )
    model, _, _ = build_models(cfg)
    x = jnp.zeros((1, 8), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, x, jnp.asarray([8], jnp.int32),
                           sid=jnp.asarray([0], jnp.int32), max_frames=16,
                           method=SynthesizerTrn.infer)
    return cfg, variables["params"]


def test_multispeaker_stream_matches_synthesize(ms_setup):
    """Streaming carries the speaker embedding g through every window."""
    cfg, params = ms_setup
    s = Synthesizer(cfg, params, buckets=((16, 24), (80, 96)))
    text = "hello there streaming world"
    mono = s.synthesize([text], sid=[3], seed=9)[0].audio
    cat = np.concatenate(
        list(s.stream(text, sid=3, seed=9, chunk_frames=8))
    )
    assert cat.shape == mono.shape
    # 4e-5: streaming tolerance (2e-5) + synthesize()'s 16-bit transfer
    # quantization (1 LSB = 3.05e-5 half-width 1.5e-5; serving.py)
    np.testing.assert_allclose(cat, mono, atol=4e-5)
    # a different speaker actually sounds different
    other = np.concatenate(list(s.stream(text, sid=1, seed=9,
                                         chunk_frames=8)))
    assert not np.array_equal(cat, other)


def test_mesh_sharded_multispeaker_matches_single_device(ms_setup):
    """The sid path also shards over the mesh (sid is a [tier] array under
    the batch sharding) — multi-speaker sharded output must match the
    single-device path."""
    from torch_tts_tpu.parallel.mesh import make_mesh

    cfg, params = ms_setup
    buckets = ((16, 24),)
    base = Synthesizer(cfg, params, buckets=buckets, batch_tiers=(8,))
    msynth = Synthesizer(cfg, params, buckets=buckets, batch_tiers=(8,),
                         mesh=make_mesh())
    texts = ["hi", "yes", "hello"]
    sids = [1, 3, 2]
    a = base.synthesize(texts, sid=sids, seed=11)
    b = msynth.synthesize(texts, sid=sids, seed=11)
    for ra, rb in zip(a, b):
        assert ra.audio.shape == rb.audio.shape and len(ra.audio) > 0
        # one 16-bit transfer quantum (3.05e-5): a float diff at a
        # rounding boundary flips one LSB between the two paths
        np.testing.assert_allclose(ra.audio, rb.audio, atol=3.2e-5)
    # speakers actually differ (sid is threaded, not ignored)
    c = msynth.synthesize(texts, sid=[0, 0, 0], seed=11)
    assert not np.array_equal(a[0].audio, c[0].audio)


def test_continuous_batcher_over_mesh(synth):
    """The batcher loop drives mesh-sharded dispatches unchanged."""
    from torch_tts_tpu.infer.serving import ContinuousBatcher
    from torch_tts_tpu.parallel.mesh import make_mesh

    msynth = Synthesizer(synth.cfg, synth.params, buckets=((16, 24),),
                         batch_tiers=(8,), mesh=make_mesh())
    # queue all three BEFORE starting the loop: one drain -> one group, so
    # batch rows (and row-indexed noise draws) match the direct call, whose
    # sort-by-length order equals this ascending submission order
    cb = ContinuousBatcher(msynth, autostart=False)
    futs = [cb.submit(t, seed=4) for t in ("hi", "yes", "hello")]
    cb.start()
    outs = [f.result(timeout=120) for f in futs]
    cb.close()
    assert all(len(o.audio) > 0 for o in outs)
    # matches the direct mesh path (same tier, same seed, one group)
    direct = msynth.synthesize(["hi", "yes", "hello"], seed=4)
    for o, d in zip(outs, direct):
        # one 16-bit transfer quantum, see above
        np.testing.assert_allclose(o.audio, d.audio, atol=3.2e-5)


def test_mesh_default_tiers_scale_and_validate(synth):
    """Default batch tiers scale by mesh size (every tier splits evenly
    across chips); explicit non-divisible tiers are rejected."""
    from torch_tts_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    s = Synthesizer(synth.cfg, synth.params, buckets=((16, 24),), mesh=mesh)
    assert s.batch_tiers == [8 * t for t in (1, 2, 8)]  # DEFAULT_BATCH_TIERS x mesh
    with pytest.raises(ValueError, match="divisible"):
        Synthesizer(synth.cfg, synth.params, buckets=((16, 24),),
                    batch_tiers=(4,), mesh=mesh)


def test_split_for_synthesis_prefers_sentence_boundaries():
    from torch_tts_tpu.infer.serving import split_for_synthesis

    text = "one two. three four! five, six seven"
    chunks = split_for_synthesis(text, lambda s: len(s) <= 12)
    assert chunks == ["one two.", "three four!", "five,", "six seven"]
    # everything fits -> one chunk, untouched
    assert split_for_synthesis(text, lambda s: True) == [text]
    # an unbreakable over-limit token raises
    with pytest.raises(ValueError, match="too long"):
        split_for_synthesis("supercalifragilistic", lambda s: len(s) <= 5)
    # no-text-loss property: chunk words == original words, any limit
    text2 = "one two three, four five. six seven! eight nine ten."
    for limit in (8, 12, 20, 30, 100):
        chunks = split_for_synthesis(text2, lambda s: len(s) <= limit)
        assert " ".join(chunks).split() == text2.split(), limit


def test_synthesize_long(synth):
    """Long text chunks at sentence boundaries, chunks ride the normal
    bucketed batch path, audio concatenates in order (+ optional pause)."""
    sent = "this sentence fills a bucket nicely."
    long_text = " ".join([sent] * 6)
    # each sentence alone exceeds the small bucket? no — but 6 of them
    # exceed the largest (80-token) bucket, forcing >1 chunk
    assert len(synth.encode_text(long_text)) > synth.buckets[-1][0]
    r = synth.synthesize_long(long_text, seed=5)
    assert r.audio.ndim == 1 and len(r.audio) > 0
    # with a pause, total length grows by exactly (n_chunks-1) * pause
    r_pause = synth.synthesize_long(long_text, pause_ms=100.0, seed=5)
    extra = len(r_pause.audio) - len(r.audio)
    pause_samples = int(0.1 * r.sample_rate)
    assert extra > 0 and extra % pause_samples == 0


def test_stream_matches_synthesize(synth):
    """Serving-level streaming: concatenated chunks equal the monolithic
    synthesize() audio (same bucket, same seed) to the streaming tolerance,
    and the first chunk arrives without decoding the whole utterance."""
    text = "hello there streaming world"
    mono = synth.synthesize([text], seed=9)[0].audio
    pieces = list(synth.stream(text, chunk_frames=8, context_frames=32,
                               seed=9))
    assert len(pieces) >= 2  # actually chunked
    cat = np.concatenate(pieces)
    assert cat.shape == mono.shape
    # streaming tolerance + synthesize()'s 16-bit transfer quantization
    np.testing.assert_allclose(cat, mono, atol=4e-5)


def test_stream_long_matches_per_chunk_synthesis(synth):
    """Long-form streaming equals per-chunk batch-1 synthesis with pauses
    between chunks. (Not compared against synthesize_long: that BATCHES the
    chunks into one tier-padded dispatch, and noise draws include the batch
    dimension — different shapes, different samples, by design.)"""
    from torch_tts_tpu.infer.serving import split_for_synthesis

    long_text = "this sentence fills a bucket nicely. " * 4
    limit = synth.buckets[-1][0]
    chunks = split_for_synthesis(
        long_text, lambda s: len(synth.encode_text(s)) <= limit
    )
    assert len(chunks) > 1
    pause = np.zeros(int(0.05 * 8000), np.float32)
    parts = []
    for i, c in enumerate(chunks):
        if i:
            parts.append(pause)
        parts.append(synth.synthesize([c], seed=6)[0].audio)
    expected = np.concatenate(parts)
    cat = np.concatenate(
        list(synth.stream_long(long_text, pause_ms=50.0, seed=6))
    )
    assert cat.shape == expected.shape
    # streaming tolerance + synthesize()'s 16-bit transfer quantization
    np.testing.assert_allclose(cat, expected, atol=4e-5)


def test_warmup_compiles_full_grid(synth):
    """warmup() populates exactly len(buckets) x len(batch_tiers)
    executables, so steady-state traffic of ANY group size/bucket never
    pays a compile (the on-chip serving bench hit cold tier compiles and
    blew its request timeout before this existed)."""
    n = synth.warmup()
    assert n == len(synth.buckets) * len(synth.batch_tiers)
    assert len(synth._infer_cache) == n
    # traffic after warmup adds nothing
    synth.synthesize(["hi", "hello there", "one more"], seed=3)
    assert len(synth._infer_cache) == n


def test_warmup_streaming_covers_stream_path(synth):
    """warmup_streaming() populates the latents-prefix fn per bucket and
    the StreamingDecoder, so a following stream() adds no new programs."""
    ns = synth.warmup_streaming()
    assert ns == len(synth.buckets)
    before = set(synth._aux_cache.keys())
    assert any(k[0] == "latents" for k in before)
    assert any(k[0] == "streamdec" for k in before)
    list(synth.stream("hello there streaming world", seed=2))
    assert set(synth._aux_cache.keys()) == before


def test_continuous_batcher_survives_oversized_request(synth):
    """A request longer than the largest bucket fails ITS future with
    ValueError; the loop thread survives and keeps serving (it previously
    died in the grouping code, hanging every in-flight future)."""
    from torch_tts_tpu.infer.serving import ContinuousBatcher

    with ContinuousBatcher(synth) as cb:
        bad = cb.submit("x" * 500)
        good = cb.submit("hi")
        with pytest.raises(ValueError, match="too long"):
            bad.result(timeout=60)
        r = good.result(timeout=60)
        assert len(r.audio) > 0
        # and the loop still serves AFTER the failure
        r2 = cb.submit("again", seed=2).result(timeout=60)
        assert len(r2.audio) > 0


def test_fetch_deadline_raises_and_recovers(synth, monkeypatch):
    """fetch_with_deadline bounds a wedged device->host fetch (the tunnel's
    half-down mode, CLAUDE.md): the fetch raises FetchTimeoutError instead
    of blocking forever, and a subsequent fetch works."""
    import time

    from torch_tts_tpu.infer import serving

    real_fetch = serving._device_fetch
    state = {"hang_next": True}

    def flaky_fetch(arr):
        if state["hang_next"]:
            state["hang_next"] = False
            time.sleep(3.0)  # well past the 0.3 s deadline
        return real_fetch(arr)

    monkeypatch.setattr(serving, "_device_fetch", flaky_fetch)
    x = np.arange(8.0)
    with pytest.raises(serving.FetchTimeoutError):
        serving.fetch_with_deadline(x, 0.3)
    out = serving.fetch_with_deadline(x, 0.3)
    np.testing.assert_array_equal(out, x)


def test_continuous_batcher_survives_wedged_fetch(synth, monkeypatch):
    """A wedged fetch mid-serving fails THAT group's futures with
    FetchTimeoutError, increments the fetch_timeouts_total counter, and the
    loop keeps serving later requests (VERDICT r4 weak #2: a production
    server must not wedge on one stuck fetch)."""
    import dataclasses as _dc
    import time

    from torch_tts_tpu.infer import serving
    from torch_tts_tpu.infer.serving import ContinuousBatcher, FetchTimeoutError

    wsynth = Synthesizer(synth.cfg, synth.params, buckets=synth.buckets,
                         fetch_timeout_s=0.5)
    # warm the compile first so the deadline only times the injected hang
    wsynth.synthesize(["hello"], seed=1)

    real_fetch = serving._device_fetch
    state = {"arm": False}

    def flaky_fetch(arr):
        if state["arm"]:
            state["arm"] = False
            time.sleep(3.0)
        return real_fetch(arr)

    monkeypatch.setattr(serving, "_device_fetch", flaky_fetch)
    cb = ContinuousBatcher(wsynth, autostart=False)
    state["arm"] = True
    f1 = cb.submit("hello", seed=2)
    cb.start()
    with pytest.raises(FetchTimeoutError):
        f1.result(timeout=60)
    # the loop is still alive: the next request succeeds
    f2 = cb.submit("hello again", seed=3)
    res = f2.result(timeout=120)
    cb.close()
    assert len(res.audio) > 0
    stats = cb.stats()
    assert stats["fetch_timeouts_total"] >= 1
    assert stats["failures_total"] >= 1
