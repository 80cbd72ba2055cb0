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


def test_warmup_compiles_grid(synth):
    synth.warmup()
    assert len(synth._fns) == len(BUCKETS) * len(TIERS)
