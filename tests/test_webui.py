"""Web UI / HTTP serving daemon: the stdlib server rides the production
serving stack (Synthesizer + ContinuousBatcher) — concurrent requests share
dispatches, per-request failures return 400 without killing the server."""

import json
import threading
import urllib.error
import urllib.request

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
def server_url():
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

    model, _, _ = build_models(cfg)
    x = jnp.zeros((1, 8), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, x, jnp.asarray([8], jnp.int32), max_frames=16,
                           method=SynthesizerTrn.infer)
    synth = Synthesizer(cfg, variables["params"], buckets=((16, 24),),
                        batch_tiers=(1, 2, 4))

    from torch_tts_tpu.cli.webui import make_server

    server, batcher = make_server(synth, port=0, host="127.0.0.1",
                                  stream_chunks=(8, 64))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address
    yield f"http://{host}:{port}"
    server.shutdown()
    batcher.close()


def test_healthz(server_url):
    with urllib.request.urlopen(f"{server_url}/healthz", timeout=60) as r:
        payload = json.loads(r.read())
    assert payload["status"] == "ok"
    assert payload["batch_tiers"] == [1, 2, 4]


def test_tts_returns_wav(server_url):
    with urllib.request.urlopen(
        f"{server_url}/tts?text=hi&seed=3", timeout=300
    ) as r:
        data = r.read()
        assert r.headers["Content-Type"] == "audio/wav"
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE" and len(data) > 44


def test_concurrent_requests_batch_and_succeed(server_url):
    results = [None, None]

    def fetch(i, text):
        with urllib.request.urlopen(
            f"{server_url}/tts?text={text}&seed={i}", timeout=300
        ) as r:
            results[i] = r.read()

    ts = [threading.Thread(target=fetch, args=(0, "hi")),
          threading.Thread(target=fetch, args=(1, "yes"))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert all(r is not None and r[:4] == b"RIFF" for r in results)


def test_long_text_routes_to_longform(server_url):
    """Text over the largest bucket is sentence-chunked via synthesize_long
    instead of erroring — narration-length requests just work."""
    text = urllib.parse.quote("go on. " * 8)  # total > the 16-token bucket
    with urllib.request.urlopen(
        f"{server_url}/tts?text={text}", timeout=600
    ) as r:
        data = r.read()
    assert data[:4] == b"RIFF" and len(data) > 44


def test_unsplittable_text_is_400_and_server_survives(server_url):
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(
            f"{server_url}/tts?text={'x' * 200}", timeout=300
        )
    assert exc.value.code == 400
    # server still serves afterwards
    with urllib.request.urlopen(f"{server_url}/tts?text=ok", timeout=300) as r:
        assert r.read()[:4] == b"RIFF"


def test_tts_stream_pcm_matches_wav(server_url):
    """/tts_stream chunked PCM equals /tts WAV payload (same seed) within
    1 LSB (both quantize the same float audio); headers carry the format."""
    with urllib.request.urlopen(
        f"{server_url}/tts?text=go+on&seed=5", timeout=300
    ) as r:
        wav = r.read()
    with urllib.request.urlopen(
        f"{server_url}/tts_stream?text=go+on&seed=5&chunk=8", timeout=300
    ) as r:
        assert r.headers["X-Format"] == "s16le-mono"
        assert int(r.headers["X-Sample-Rate"]) == 8000
        pcm = r.read()

    import numpy as np

    a = np.frombuffer(wav[44:], "<i2").astype(np.int32)  # PCM WAV: 44B header
    b = np.frombuffer(pcm, "<i2").astype(np.int32)
    assert len(b) == len(a) > 0
    assert np.max(np.abs(a - b)) <= 1


def test_tts_stream_long_text(server_url):
    """Over-bucket text streams sentence-by-sentence (stream_long)."""
    text = urllib.parse.quote("go on. " * 8)
    with urllib.request.urlopen(
        f"{server_url}/tts_stream?text={text}&pause_ms=20", timeout=600
    ) as r:
        pcm = r.read()
    assert len(pcm) > 0 and len(pcm) % 2 == 0


def test_metrics_counters(server_url):
    """/metrics reflects batcher traffic in Prometheus text format. Runs
    after the other tests in this module, so counters are nonzero."""
    urllib.request.urlopen(f"{server_url}/tts?text=hi&seed=2",
                           timeout=300).read()
    with urllib.request.urlopen(f"{server_url}/metrics", timeout=60) as r:
        body = r.read().decode()
    metrics = {l.split()[0]: float(l.split()[1])
               for l in body.splitlines() if l and not l.startswith("#")}
    assert metrics["tts_requests_total"] >= 1
    assert metrics["tts_batches_total"] >= 1
    assert metrics["tts_batched_requests_total"] >= metrics["tts_batches_total"]
    assert metrics["tts_dispatch_ms_sum"] > 0
    assert metrics["tts_compiled_executables"] >= 1
    assert "# TYPE tts_queue_depth gauge" in body


def test_index_form(server_url):
    with urllib.request.urlopen(server_url, timeout=60) as r:
        body = r.read()
    assert b"<form" in body


@pytest.fixture(scope="module")
def taco_server_url():
    """Server with BOTH model families: /tts (VITS2 batcher) + /tts_taco
    (AR tacotron with the fused neural vocoder)."""
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

    tcfg = TacotronConfig(
        audio=TacotronAudioConfig(sample_rate=8000, hop_length=32,
                                  win_length=128, num_mels=20,
                                  fmin=0.0, fmax=3800.0),
        text=TacotronTextConfig(),
        model=TacotronModelConfig(
            encoder_type="tacotron2", dim_emb=16, dim_out=16,
            decoder_type="tacotron2", r=2, dim_pre=8, dim_att=16,
            dim_rnn=(16, 16), postnet_type=None,
        ),
    )
    model = build_tacotron(tcfg)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(
        rngs, jnp.zeros((1, 8), jnp.int32), jnp.asarray([8], jnp.int32),
        jnp.zeros((1, 4, 20)), train=True, deterministic=False,
    )
    gk = dict(resblock="2", resblock_kernel_sizes=(3,),
              resblock_dilation_sizes=((1, 3),), upsample_rates=(4, 4, 2),
              upsample_initial_channel=16, upsample_kernel_sizes=(8, 8, 4))
    voc = Vocoder(
        params=Generator(**gk).init(
            {"params": jax.random.PRNGKey(7)}, jnp.zeros((1, 8, 20))
        )["params"],
        gen_kwargs=gk, sample_rate=8000, num_mels=20,
    )
    taco = TacotronSynthesizer(tcfg, variables, vocoder=voc,
                               buckets=((32, 16),), batch_tiers=(1, 2))

    # minimal VITS2 synth (reuses the same tiny recipe as server_url)
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

    vmodel, _, _ = build_models(cfg)
    x = jnp.zeros((1, 8), jnp.int32)
    vvars = vmodel.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        x, jnp.asarray([8], jnp.int32), max_frames=16,
        method=SynthesizerTrn.infer,
    )
    synth = Synthesizer(cfg, vvars["params"], buckets=((16, 24),),
                        batch_tiers=(1,))

    from torch_tts_tpu.cli.webui import make_server

    server, batcher = make_server(synth, port=0, host="127.0.0.1",
                                  taco_synth=taco,
                                  taco_stream_params=((4, 12),))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address
    yield f"http://{host}:{port}"
    server.shutdown()
    batcher.close()
    server.taco_batcher.close()


def test_tts_taco_returns_wav(taco_server_url):
    with urllib.request.urlopen(
        f"{taco_server_url}/tts_taco?text=hello%20there&seed=3", timeout=300
    ) as r:
        body = r.read()
    assert r.headers["Content-Type"] == "audio/wav"
    assert body[:4] == b"RIFF" and len(body) > 44
    with urllib.request.urlopen(
        f"{taco_server_url}/healthz", timeout=60
    ) as r:
        assert json.loads(r.read())["tacotron"] is True


def test_tts_taco_404_without_model(server_url):
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"{server_url}/tts_taco?text=x", timeout=60)
    assert e.value.code == 404


def test_tts_taco_stream_pcm_matches_wav(taco_server_url):
    """/tts_taco_stream PCM equals the /tts_taco WAV up to the WAV path's
    peak normalization (streamed chunks are unnormalized) and s16
    quantization. chunk=4&pad=12 sizes the emission window inside the tiny
    test bucket so the exact streaming path (not the short-text fallback)
    is exercised."""
    url = (f"{taco_server_url}/tts_taco_stream?text=hello%20there&seed=3"
           f"&chunk=4&pad=12")
    with urllib.request.urlopen(url, timeout=300) as r:
        pcm = r.read()
        assert r.headers["X-Format"] == "s16le-mono"
        sr = int(r.headers["X-Sample-Rate"])
    stream = np.frombuffer(pcm, "<i2").astype(np.float32) / 32767.0

    with urllib.request.urlopen(
        f"{taco_server_url}/tts_taco?text=hello%20there&seed=3", timeout=300
    ) as r:
        body = r.read()
    from scipy.io import wavfile
    import io as _io

    sr_wav, wav = wavfile.read(_io.BytesIO(body))
    wav = wav.astype(np.float32) / 32767.0
    assert sr == sr_wav
    assert stream.size == wav.size
    # same signal up to a positive scale (the WAV path peak-normalizes)
    num = float(np.dot(stream, wav))
    den = float(np.linalg.norm(stream) * np.linalg.norm(wav))
    assert den > 0 and num / den > 0.999


def test_tts_taco_concurrent_requests_batch(taco_server_url):
    """Concurrent /tts_taco requests ride the taco ContinuousBatcher (the
    same queue->tier->dispatch machinery as /tts) and their traffic shows
    up under the tts_taco_* metric prefix."""
    results = [None, None]

    def fetch(i, text):
        with urllib.request.urlopen(
            f"{taco_server_url}/tts_taco?text={text}&seed={i}", timeout=300
        ) as r:
            results[i] = r.read()

    ts = [threading.Thread(target=fetch, args=(0, "hi%20there")),
          threading.Thread(target=fetch, args=(1, "yes%20indeed"))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert all(r is not None and r[:4] == b"RIFF" for r in results)

    with urllib.request.urlopen(f"{taco_server_url}/metrics", timeout=60) as r:
        body = r.read().decode()
    metrics = {l.split()[0]: float(l.split()[1])
               for l in body.splitlines() if l and not l.startswith("#")}
    assert metrics["tts_taco_requests_total"] >= 2
    assert metrics["tts_taco_batches_total"] >= 1
    assert (metrics["tts_taco_batched_requests_total"]
            >= metrics["tts_taco_batches_total"])
    assert "# TYPE tts_taco_queue_depth gauge" in body


def test_stream_chunk_allowlist(server_url, taco_server_url):
    """Off-allowlist stream params are 400, not a fresh executable compile:
    stream programs are cached per distinct (chunk[, pad]), so the server
    bounds client-chosen values (make_server stream_chunks /
    taco_stream_params)."""
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(
            f"{server_url}/tts_stream?text=hi&chunk=7", timeout=60)
    assert e.value.code == 400 and b"allowed" in e.value.read()
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(
            f"{taco_server_url}/tts_taco_stream?text=hi&chunk=5&pad=13",
            timeout=60)
    assert e.value.code == 400 and b"allowed" in e.value.read()
