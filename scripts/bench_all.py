"""All five BASELINE benchmark configs (BASELINE.json), one JSON line each.

1. mel frontend (STFT + slaney filterbank) throughput
2. Tacotron2 encoder + AR attention-decoder mel inference
3. VITS2 single-speaker text->waveform inference
4. VITS2 multi-speaker inference with speaker embeddings
5. VITS2 full GAN training step

Methodology as bench.py: each timing forces execution via a dependent scalar
fetch; single-call numbers include one ~30 ms dev-tunnel round trip.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _fill(shapes):
    import jax
    import jax.numpy as jnp

    host = np.random.default_rng(0)
    return jax.tree.map(
        lambda s: jnp.asarray(0.02 * host.standard_normal(s.shape).astype("float32"))
        if jnp.issubdtype(s.dtype, jnp.floating)
        else jnp.zeros(s.shape, s.dtype),
        shapes,
    )


def _time(fn, *args, n=10):
    import jax

    jax.block_until_ready(fn(*args))  # compile
    float(np.asarray(fn(*args)))  # one forced run
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def emit(metric, value, unit, vs=None):
    print(json.dumps({"metric": metric, "value": round(value, 3), "unit": unit,
                      "vs_baseline": vs}))


def bench_mel():
    import jax
    import jax.numpy as jnp

    from torch_tts_tpu.kernels.stft import mel_spectrogram_auto

    rng = np.random.default_rng(0)
    secs = 8 * 10  # 8 clips x 10 s
    y = jnp.asarray((rng.standard_normal((8, 22050 * 10)) * 0.3).astype(np.float32))
    # bulk shape -> the fused Pallas STFT+mel kernel (17% faster than the
    # XLA rfft path at this shape; scripts/bench_mel_kernel.py A/B)
    fn = jax.jit(lambda y: jnp.sum(mel_spectrogram_auto(y, 1024, 80, 22050, 256, 1024)))
    dt = _time(fn, y)
    emit("mel_frontend_throughput", secs / dt, "audio_s_per_s")


def bench_tacotron():
    import jax
    import jax.numpy as jnp

    from torch_tts_tpu.core.config import TacotronConfig
    from torch_tts_tpu.models.tacotron import build_tacotron

    cfg = TacotronConfig()
    model = build_tacotron(cfg)
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.integers(1, model.alphabet_size, (1, 128)), jnp.int32)
    cl = jnp.full((1,), 128, jnp.int32)
    init_rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
                 "dropout": jax.random.PRNGKey(2)}
    v = _fill(jax.eval_shape(lambda: model.init(
        init_rngs, cond, cl, jnp.zeros((1, 2, cfg.audio.num_mels)),
        train=True, deterministic=False)))

    @jax.jit
    def fn(v, cond, cl, key):
        y, y_post, s, aux = model.apply(v, cond, cl, max_steps=400,
                                        rngs={"dropout": key, "noise": key})
        return jnp.sum(jnp.abs(y_post))

    dt = _time(fn, v, cond, cl, jax.random.PRNGKey(5))
    rt = cfg.audio.sample_rate / cfg.audio.hop_length
    emit("tacotron2_ar_infer_frames_per_s", 400 / dt, "frames_per_s",
         round(400 / dt / rt / 10.0, 3))


def _vits2_infer_bench(multispeaker: bool):
    import jax
    import jax.numpy as jnp

    from torch_tts_tpu.core.config import VITS2Config
    from torch_tts_tpu.models.vits2 import SynthesizerTrn
    from torch_tts_tpu.text import symbols

    cfg = VITS2Config()
    mkw = dict(pack_narrow_convs=True)
    if multispeaker:
        mkw.update(n_speakers=109, gin_channels=256, use_spk_conditioned_encoder=True)
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, **mkw))
    model = SynthesizerTrn(n_vocab=len(symbols), spec_channels=cfg.posterior_channels,
                           segment_frames=cfg.segment_frames, cfg=cfg.model)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, len(symbols), (1, 256)), jnp.int32)
    xl = jnp.full((1,), 256, jnp.int32)
    sid = jnp.asarray([3], jnp.int32) if multispeaker else None
    MAX_F = 1024
    init_rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
                 "dropout": jax.random.PRNGKey(2)}
    v = _fill(jax.eval_shape(lambda: model.init(
        init_rngs, x, xl, sid=sid, max_frames=MAX_F, method=SynthesizerTrn.infer)))

    @jax.jit
    def fn(v, x, xl, sid, key):
        audio, *_ = model.apply(v, x, xl, sid=sid, noise_scale=0.667,
                                noise_scale_w=0.8, length_scale=1.0,
                                max_frames=MAX_F, method=SynthesizerTrn.infer,
                                rngs={"noise": key})
        return jnp.sum(jnp.abs(audio))

    dt = _time(fn, v, x, xl, sid, jax.random.PRNGKey(5))
    audio_s = MAX_F * cfg.audio.hop_length / cfg.audio.sampling_rate
    name = "vits2_ms_infer_rtf" if multispeaker else "vits2_infer_rtf"
    emit(name, audio_s / dt, "x_realtime", round(audio_s / dt / 10.0, 3))


def bench_train_step():
    import jax
    import jax.numpy as jnp

    from torch_tts_tpu.core.config import VITS2Config
    from torch_tts_tpu.models.vits2 import MultiPeriodDiscriminator, SynthesizerTrn
    from torch_tts_tpu.text import symbols
    from torch_tts_tpu.train.vits2_train import create_train_state, make_train_step

    cfg = VITS2Config()
    model = SynthesizerTrn(n_vocab=len(symbols), spec_channels=cfg.posterior_channels,
                           segment_frames=cfg.segment_frames, cfg=cfg.model)
    mpd = MultiPeriodDiscriminator()
    B, T_X, T_Y = 8, 192, 1000
    hop = cfg.audio.hop_length
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.integers(1, len(symbols), (B, T_X)), jnp.int32),
        "x_lengths": jnp.full((B,), T_X, jnp.int32),
        "spec": jnp.asarray(
            rng.standard_normal((B, T_Y, cfg.posterior_channels)).astype(np.float32)),
        "spec_lengths": jnp.full((B,), T_Y, jnp.int32),
        "wav": jnp.asarray((rng.standard_normal((B, T_Y * hop, 1)) * 0.1).astype(np.float32)),
        "wav_lengths": jnp.full((B,), T_Y * hop, jnp.int32),
    }
    state, tx = create_train_state(cfg, model, mpd, sample_batch=batch)
    step_fn = jax.jit(make_train_step(cfg, model, mpd, tx), donate_argnums=(0,))
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    float(np.asarray(metrics["loss/g/total"]))
    n = 20
    t0 = time.perf_counter()
    for i in range(n):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i + 1))
    float(np.asarray(metrics["loss/g/total"]))
    dt = (time.perf_counter() - t0) / n
    emit("vits2_train_steps_per_s", 1 / dt, "steps_per_s")


if __name__ == "__main__":
    bench_mel()
    bench_tacotron()
    _vits2_infer_bench(False)
    _vits2_infer_bench(True)
    bench_train_step()
