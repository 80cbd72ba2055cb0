"""The full jitted GAN train step: runs, updates all parameter sets, and
compiles/executes sharded over an 8-device CPU mesh (the multi-chip path)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_tts_tpu.core.config import (
    AudioConfig,
    VITS2Config,
    VITS2ModelConfig,
    VITS2TrainConfig,
)
from torch_tts_tpu.models.vits2 import (
    DurationDiscriminatorV1,
    MultiPeriodDiscriminator,
    SynthesizerTrn,
)
from torch_tts_tpu.parallel import make_mesh, replicate, shard_batch
from torch_tts_tpu.train import checkpoint as ckpt
from torch_tts_tpu.train.vits2_train import (
    TrainState,
    create_train_state,
    make_train_step,
)

HOP = 64


def tiny_config(**model_kw):
    model = VITS2ModelConfig(
        inter_channels=16,
        hidden_channels=16,
        filter_channels=32,
        n_heads=2,
        n_layers=1,
        kernel_size=3,
        p_dropout=0.1,
        resblock="2",
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        upsample_rates=(8, 8),
        upsample_initial_channel=32,
        upsample_kernel_sizes=(16, 16),
        use_sdp=True,
        use_transformer_flows=True,
        transformer_flow_type="pre_conv",
        segment_size=4 * HOP,
        use_noise_scaled_mas=True,
        **model_kw,
    )
    audio = AudioConfig(
        sampling_rate=8000, filter_length=128, hop_length=HOP, win_length=128,
        n_mel_channels=20,
    )
    train = VITS2TrainConfig(batch_size=8, c_mel=45.0, c_kl=1.0)
    return VITS2Config(audio=audio, model=model, train=train)


def make_batch(rng, cfg, B=8, T_x=9, T_y=24):
    L = T_y * HOP
    return {
        "x": jnp.asarray(rng.integers(1, 30, (B, T_x))),
        "x_lengths": jnp.asarray([T_x] * (B - 1) + [T_x - 2]),
        "spec": jnp.asarray(
            rng.standard_normal((B, T_y, cfg.posterior_channels)).astype(np.float32)
        ),
        "spec_lengths": jnp.asarray([T_y] * (B - 1) + [T_y - 4]),
        "wav": jnp.asarray(rng.standard_normal((B, L, 1)).astype(np.float32) * 0.1),
        "wav_lengths": jnp.asarray([L] * B),
    }


def build_all(cfg, rng, dur_disc_on=False):
    model = SynthesizerTrn(
        n_vocab=30, spec_channels=cfg.posterior_channels,
        segment_frames=cfg.segment_frames, cfg=cfg.model,
    )
    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    dd = DurationDiscriminatorV1(cfg.model.hidden_channels) if dur_disc_on else None
    batch = make_batch(rng, cfg)
    state, tx = create_train_state(
        cfg, model, mpd, dur_disc=dd, sample_batch=batch, steps_per_epoch=10
    )
    step_fn = make_train_step(cfg, model, mpd, tx, dur_disc=dd)
    return model, mpd, dd, batch, state, step_fn


def test_train_step_runs_and_updates(rng):
    cfg = tiny_config()
    model, mpd, dd, batch, state, step_fn = build_all(cfg, rng)
    step_jit = jax.jit(step_fn)
    new_state, metrics = step_jit(state, batch, jax.random.PRNGKey(0))
    assert int(new_state.step) == 1
    for key in ["loss/g/total", "loss/d/total", "loss/g/mel", "loss/g/kl",
                "grad_norm_g", "grad_norm_d"]:
        v = float(metrics[key])
        assert np.isfinite(v), f"{key} = {v}"

    # parameters actually moved
    def moved(a, b):
        return any(
            np.abs(np.asarray(x) - np.asarray(y)).max() > 0
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    assert moved(state.params_g, new_state.params_g)
    assert moved(state.params_d, new_state.params_d)

    # second step: loss stays finite
    new_state2, metrics2 = step_jit(new_state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics2["loss/g/total"]))


def test_train_step_with_duration_discriminator(rng):
    cfg = tiny_config(use_duration_discriminator=True)
    model, mpd, dd, batch, state, step_fn = build_all(cfg, rng, dur_disc_on=True)
    new_state, metrics = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss/dur_disc"]))
    assert new_state.params_dur is not None


def test_train_step_sharded_8dev(rng):
    """The multi-chip path: batch sharded over an 8-device data mesh."""
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    cfg = tiny_config()
    model, mpd, dd, batch, state, step_fn = build_all(cfg, rng)
    mesh = make_mesh()
    state = replicate(state, mesh)
    batch = shard_batch(batch, mesh)
    step_jit = jax.jit(step_fn)
    new_state, metrics = step_jit(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss/g/total"]))
    # updated params remain replicated
    leaf = jax.tree.leaves(new_state.params_g)[0]
    assert leaf.sharding.is_fully_replicated


def test_checkpoint_roundtrip_and_keep3(rng, tmp_path):
    cfg = tiny_config()
    model, mpd, dd, batch, state, step_fn = build_all(cfg, rng)
    d = str(tmp_path)
    for step in [10, 20, 30, 40]:
        ckpt.save_checkpoint(d, step, state, keep=3)
    assert len(ckpt.list_checkpoints(d)) == 3
    latest = ckpt.latest_checkpoint(d)
    assert latest.endswith("ckpt_40.msgpack")

    restored = ckpt.restore_checkpoint(latest, state)
    a = jax.tree.leaves(state.params_g)[0]
    b = jax.tree.leaves(restored.params_g)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_multispeaker(rng):
    cfg = tiny_config(n_speakers=4, gin_channels=8)
    model = SynthesizerTrn(
        n_vocab=30, spec_channels=cfg.posterior_channels,
        segment_frames=cfg.segment_frames, cfg=cfg.model,
    )
    mpd = MultiPeriodDiscriminator(periods=(2,))
    batch = make_batch(rng, cfg, B=4)
    batch["sid"] = jnp.asarray([0, 1, 2, 3])
    state, tx = create_train_state(
        cfg, model, mpd, sample_batch=batch, steps_per_epoch=10
    )
    step_fn = jax.jit(make_train_step(cfg, model, mpd, tx))
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss/g/total"]))
    # speaker embedding received gradient
    emb_before = np.asarray(state.params_g["emb_g"]["embedding"])
    emb_after = np.asarray(new_state.params_g["emb_g"]["embedding"])
    assert np.abs(emb_before - emb_after).max() > 0


def test_train_step_bf16(rng):
    """bf16 compute path: fp32 master params, finite losses."""
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, use_bf16=True)
    )
    model, mpd, dd, batch, state, step_fn = build_all(cfg, rng)
    new_state, metrics = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss/g/total"]))
    assert jax.tree.leaves(new_state.params_g)[0].dtype == jnp.float32


def test_train_step_lightning_order(rng):
    """cli.py ordering (single generator forward) runs and updates all nets."""
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, step_order="lightning")
    )
    model, mpd, dd, batch, state, step_fn = build_all(cfg, rng)
    new_state, metrics = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss/g/total"]))
    assert np.isfinite(float(metrics["loss/d/total"]))
    a = jax.tree.leaves(state.params_g)[0]
    b = jax.tree.leaves(new_state.params_g)[0]
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 0


def test_train_step_lightning_weighting(rng):
    """cli.py loss weighting (vits2/cli.py:325-337): total G loss is the
    coefficient-weighted mean-combination normalized by the coefficient sum,
    with gen meaned (not summed) over sub-discriminators."""
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, step_order="lightning",
                                       c_mel=10.0, c_kl=0.2)
    )
    model, mpd, dd, batch, state, step_fn = build_all(cfg, rng)
    _, m = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(0))
    t = cfg.train
    expected = (
        float(m["loss/g/gen"])
        + t.c_fm * float(m["loss/g/fm"])
        + t.c_dur * float(m["loss/g/dur"])
        + t.c_kl * float(m["loss/g/kl"])
        + t.c_mel * float(m["loss/g/mel"])
    ) / (1.0 + t.c_fm + t.c_dur + t.c_kl + t.c_mel)
    np.testing.assert_allclose(float(m["loss/g/total"]), expected, rtol=1e-5)


def test_train_step_skips_nonfinite(rng):
    """Failure detection is folded into the jitted step: a batch producing a
    non-finite loss leaves the parameters and step counter untouched and
    raises the `nonfinite` metric — no host-side sync required. (The
    optimizer's EMA state decays once on a skipped step — the documented
    price of the donation-friendly zero-the-updates formulation.)"""
    cfg = tiny_config()
    model, mpd, dd, batch, state, step_fn = build_all(cfg, rng)
    step_jit = jax.jit(step_fn)
    s1, m1 = step_jit(state, batch, jax.random.PRNGKey(0))
    assert float(m1["nonfinite"]) == 0.0

    bad = dict(batch)
    bad["spec"] = jnp.full_like(batch["spec"], jnp.nan)
    s2, m2 = step_jit(s1, bad, jax.random.PRNGKey(1))
    assert float(m2["nonfinite"]) == 1.0
    assert int(s2.step) == int(s1.step)
    for p1, p2 in ((s1.params_g, s2.params_g), (s1.params_d, s2.params_d)):
        diffs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), p1, p2
        )
        assert max(jax.tree.leaves(diffs)) == 0.0

    # recovery: the next good batch advances again
    s3, m3 = step_jit(s2, batch, jax.random.PRNGKey(2))
    assert float(m3["nonfinite"]) == 0.0
    assert int(s3.step) == int(s1.step) + 1


def test_eval_step_metrics(rng):
    """make_eval_step: held-out mel/KL/duration losses from the training
    forward — finite, deterministic under a fixed key, and responsive to the
    parameters (different params -> different losses)."""
    from torch_tts_tpu.train.vits2_train import make_eval_step

    cfg = tiny_config()
    model, mpd, dd, batch, state, step_fn = build_all(cfg, rng)
    eval_jit = jax.jit(make_eval_step(cfg, model))

    m1 = eval_jit(state.params_g, batch, jax.random.PRNGKey(0))
    m2 = eval_jit(state.params_g, batch, jax.random.PRNGKey(0))
    assert set(m1) == {"eval/loss_mel", "eval/loss_kl", "eval/loss_dur"}
    for k in m1:
        assert np.isfinite(float(m1[k])), k
        np.testing.assert_array_equal(np.asarray(m1[k]), np.asarray(m2[k]))

    s2, _ = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(1))
    m3 = eval_jit(s2.params_g, batch, jax.random.PRNGKey(0))
    assert float(m3["eval/loss_mel"]) != float(m1["eval/loss_mel"])
