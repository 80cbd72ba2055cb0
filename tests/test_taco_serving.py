"""Tacotron serving layer: bucketed/batched text->mel->wav with the neural
vocoder fused in-graph (infer/taco_serving.py). The reference has no serving
for this stack at all (tacotron/inference.py is a one-shot CLI); these tests
pin the production properties: padding exactness, bounded executable cache,
per-item trimming, and both decode paths (fused vocoder / Griffin-Lim)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_tts_tpu.core.config import (
    TacotronAudioConfig,
    TacotronConfig,
    TacotronModelConfig,
    TacotronTextConfig,
)
from torch_tts_tpu.infer.taco_serving import TacotronSynthesizer
from torch_tts_tpu.infer.vocoder import Vocoder
from torch_tts_tpu.models.tacotron import build_tacotron
from torch_tts_tpu.ops.hifigan import Generator

HOP = 32
CFG = TacotronConfig(
    audio=TacotronAudioConfig(
        sample_rate=8000, hop_length=HOP, win_length=128, num_mels=20,
        fmin=0.0, fmax=3800.0,
    ),
    text=TacotronTextConfig(),
    model=TacotronModelConfig(
        encoder_type="tacotron2", dim_emb=16, dim_out=16,
        decoder_type="tacotron2", r=2, dim_pre=8, dim_att=16,
        dim_rnn=(16, 16), postnet_type="tacotron2",
        postnet_dim_hidden=16, postnet_num_layers=2,
    ),
)
GEN_KWARGS = dict(
    resblock="2",
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
    upsample_rates=(4, 4, 2),
    upsample_initial_channel=16,
    upsample_kernel_sizes=(8, 8, 4),
)
BUCKETS = ((16, 12), (32, 24))
TIERS = (1, 2)


@pytest.fixture(scope="module")
def synth():
    model = build_tacotron(CFG)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    dummy_c = jnp.zeros((1, 8), jnp.int32)
    dummy_x = jnp.zeros((1, 2 * CFG.model.r, CFG.audio.num_mels))
    variables = model.init(rngs, dummy_c, jnp.asarray([8], jnp.int32),
                           dummy_x, train=True, deterministic=False)
    gen = Generator(**GEN_KWARGS)
    vparams = gen.init(
        {"params": jax.random.PRNGKey(7)},
        jnp.zeros((1, 8, CFG.audio.num_mels)),
    )["params"]
    voc = Vocoder(params=vparams, gen_kwargs=GEN_KWARGS,
                  sample_rate=8000, num_mels=20)
    return TacotronSynthesizer(
        CFG, variables, vocoder=voc, buckets=BUCKETS, batch_tiers=TIERS
    )


def test_synthesize_batched(synth):
    texts = ["hello world", "abc", "a somewhat longer sentence here"]
    res = synth.synthesize(texts, seed=0)
    assert len(res) == 3
    r, hop = CFG.model.r, CFG.audio.hop_length
    for out in res:
        assert out.sample_rate == 8000
        assert out.audio.ndim == 1 and out.audio.size > 0
        assert out.audio.size % (r * hop) == 0  # whole decoder groups
        assert np.abs(out.audio).max() <= 1.0 + 1e-5
        assert out.attn is not None and out.attn.ndim == 2
    # executable cache is bounded by the grid
    assert len(synth._fns) <= len(BUCKETS) * len(TIERS)


def test_padding_rows_are_exact(synth):
    """A text synthesized alone (tier 1) must equal the same text synthesized
    inside a padded batch (tier 2) up to the tier-dependent noise key — so we
    pin exactness at the PROGRAM level: same tier, one real row vs real row +
    pad row."""
    import jax

    text = "hello world"
    ids = np.asarray(synth.encoder.encode(text), np.int32)
    pad_text, max_steps = synth._bucket_for(len(ids))
    fn = synth._infer_fn(2, pad_text, max_steps)

    def run(second_len):
        c = np.zeros((2, pad_text), np.int32)
        cl = np.ones((2,), np.int32)
        c[0, : len(ids)] = ids
        cl[0] = len(ids)
        if second_len:
            c[1, :second_len] = ids[:second_len]
            cl[1] = second_len
        out = fn(synth.variables, jnp.asarray(c), jnp.asarray(cl),
                 jax.random.PRNGKey(5))
        return np.asarray(out["wav"][0]), int(np.asarray(out["stop_lengths"])[0])

    wav_a, stop_a = run(0)  # row 1 is a pad row
    wav_b, stop_b = run(7)  # row 1 is a different real text
    assert stop_a == stop_b
    np.testing.assert_allclose(wav_a, wav_b, rtol=1e-5, atol=1e-6)


def test_griffin_lim_fallback():
    model = build_tacotron(CFG)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(
        rngs, jnp.zeros((1, 8), jnp.int32), jnp.asarray([8], jnp.int32),
        jnp.zeros((1, 2 * CFG.model.r, CFG.audio.num_mels)),
        train=True, deterministic=False,
    )
    s = TacotronSynthesizer(CFG, variables, vocoder=None,
                            buckets=BUCKETS, batch_tiers=(1,),
                            griffin_lim_iters=4)
    out = s.synthesize(["short text"], seed=1)[0]
    assert out.audio.size > 0 and np.isfinite(out.audio).all()


def test_too_long_text_raises(synth):
    with pytest.raises(ValueError, match="too long"):
        synth.synthesize(["x" * 100])


def test_decode_chunk_matches_monolithic_bitexact(synth):
    """Chunked AR decode (decode_chunk carry across chunks) == the monolithic
    scan bit-for-bit, INCLUDING the always-on prenet dropout: per-step masks
    are a pure function of (key, global step index)."""
    from torch_tts_tpu.models.tacotron import Tacotron

    model, variables = synth.model, synth.variables
    text = "a somewhat longer sentence here"
    ids = np.asarray(synth.encoder.encode(text), np.int32)
    pad_text, max_steps = synth._bucket_for(len(ids))
    c = np.zeros((1, pad_text), np.int32)
    c[0, : len(ids)] = ids
    cl = jnp.asarray([len(ids)], jnp.int32)
    dk = jax.random.PRNGKey(77)

    memory, mmask = model.apply(variables, jnp.asarray(c), cl,
                                method=Tacotron.encode)
    y_mono, _s, _w, _stop = model.apply(
        variables, memory, mmask, max_steps=max_steps, dropout_key=dk,
        method=lambda m, mem, mm, **kw: m.decoder(mem, mm, x=None, **kw),
    )

    carry = model.apply(variables, memory, method=Tacotron.decode_init)
    chunks = []
    K = 4
    assert max_steps % K == 0
    for t0 in range(0, max_steps, K):
        carry, y, _stopped, _w = model.apply(
            variables, memory, mmask, carry, t0, dk, K,
            method=Tacotron.decode_chunk,
        )
        chunks.append(np.asarray(y))
    y_chunk = np.concatenate(chunks, axis=1)
    np.testing.assert_array_equal(np.asarray(y_mono), y_chunk)


def test_stream_matches_batch_path(synth):
    """stream(text, seed) concatenated == synthesize([text], seed) (tier 1)
    after peak normalization: same per-step dropout keys, and the clamped
    emission windows reproduce postnet+vocoder conv locality exactly (the
    fixture model never emits a stop, so the stream decodes the full bucket
    like the monolithic program does)."""
    text = "a somewhat longer sentence here"
    ref = synth.synthesize([text], seed=3)[0]

    chunks = list(synth.stream(text, seed=3, chunk_steps=4, pad_frames=16))
    assert len(chunks) > 1  # actually streamed, not one blob
    wav = np.concatenate(chunks)
    assert wav.shape == ref.audio.shape
    peak = max(1e-6, float(np.abs(wav).max()))
    np.testing.assert_allclose(wav / peak, ref.audio, rtol=1e-4, atol=2e-5)


def test_stream_nondivisible_chunk_covers_tail(synth):
    """chunk_steps that does NOT divide max_steps (true for 3 of the 4
    default buckets at the default chunk=32) must still decode the tail
    steps: the tail chunk overhangs max_steps in a whole-chunk buffer and
    emission clamps to the valid region. Regression: the loop used to stop
    at floor(max_steps/chunk)*chunk, silently truncating the audio."""
    text = "a somewhat longer sentence here"
    ref = synth.synthesize([text], seed=3)[0]  # bucket (32, 24)

    chunks = list(synth.stream(text, seed=3, chunk_steps=5, pad_frames=16))
    wav = np.concatenate(chunks)
    assert wav.shape == ref.audio.shape  # 24 % 5 != 0: tail not dropped
    peak = max(1e-6, float(np.abs(wav).max()))
    np.testing.assert_allclose(wav / peak, ref.audio, rtol=1e-4, atol=2e-5)


def test_stream_short_utterance_falls_back(synth):
    """A stop in the first chunks (total < one emission window) must fall
    back to the batch path before anything was yielded."""
    import copy

    s2 = copy.copy(synth)
    # force an immediate stop: fc_stop bias << stop threshold
    v = jax.device_get(synth.variables)
    v["params"]["decoder"]["fc_stop"]["bias"] = (
        v["params"]["decoder"]["fc_stop"]["bias"] - 100.0
    )
    s2.variables = jax.device_put(v)
    s2._fns = {}
    s2._stream_cache = {}
    text = "hello world"
    ref = s2.synthesize([text], seed=5)[0]
    r, hop = CFG.model.r, CFG.audio.hop_length
    assert ref.audio.size == 1 * r * hop  # stopped at group 1
    chunks = list(s2.stream(text, seed=5, chunk_steps=4, pad_frames=16))
    assert len(chunks) == 1
    np.testing.assert_allclose(chunks[0], ref.audio, rtol=1e-5, atol=1e-6)


def test_warmup_streaming_compiles_and_counts(synth):
    n = synth.warmup_streaming(chunk_steps=4, pad_frames=16)
    # bucket (16, 12): 12 groups * r2 = 24 frames < W=40 -> skipped;
    # bucket (32, 24): 48 frames >= 40 -> enc/chunk/emit compiled
    assert n == 3
    # both buckets' program triples are cached under the warmed params
    # (other tests in this module may have cached additional param keys)
    assert {(16, 12, 4, 16), (32, 24, 4, 16)} <= set(synth._stream_cache)


def test_stream_requires_vocoder():
    model = build_tacotron(CFG)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(
        rngs, jnp.zeros((1, 8), jnp.int32), jnp.asarray([8], jnp.int32),
        jnp.zeros((1, 2 * CFG.model.r, CFG.audio.num_mels)),
        train=True, deterministic=False,
    )
    s = TacotronSynthesizer(CFG, variables, vocoder=None, buckets=BUCKETS,
                            batch_tiers=(1,))
    with pytest.raises(ValueError, match="vocoder"):
        next(s.stream("hello"))


def test_warmup_compiles_grid(synth):
    synth.warmup()
    assert len(synth._fns) == len(BUCKETS) * len(TIERS)
