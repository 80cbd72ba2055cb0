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


# ---------------------------------------------------------------------------
# Gradient accumulation (reference accumulate_grad, vits2/cli.py:255-262,338-356)
# ---------------------------------------------------------------------------


def _tree_max_diff(a, b):
    return max(
        float(jnp.max(jnp.abs(x - y)))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_grad_accum_k2_matches_mean_of_single_steps(rng):
    """grad_accum=2 == the reference's accumulate_grad: k micro-batch grads
    at frozen params are averaged into one real update (cli.py's
    manual_backward(loss * 1/k) summed over k micro-batches). With a plain
    SGD inner optimizer the algebra is exactly checkable black-box:
    the post-window params must equal the MEAN of the two single-batch
    single-step results taken from the same initial state (update linear in
    the gradient). Mid-window micro-steps must leave every parameter
    untouched. Uses the lightning ordering, where all three nets' grads are
    computed at frozen params (the ddp ordering lets G see the updated D
    within a step, which has no frozen-params accumulation analogue)."""
    import dataclasses

    import optax

    from torch_tts_tpu.train.vits2_train import make_optimizer

    LR = 0.05
    cfg = tiny_config()
    base_train = dataclasses.replace(cfg.train, step_order="lightning")
    cfg1 = dataclasses.replace(cfg, train=base_train)
    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(base_train, grad_accum=2)
    )

    model = SynthesizerTrn(
        n_vocab=30, spec_channels=cfg.posterior_channels,
        segment_frames=cfg.segment_frames, cfg=cfg.model,
    )
    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    b1 = make_batch(rng, cfg)
    b2 = make_batch(rng, cfg)  # second draw: a different micro-batch
    init_key = jax.random.PRNGKey(7)
    k0, k1 = jax.random.PRNGKey(100), jax.random.PRNGKey(101)

    # accumulating run: two micro-steps
    tx2 = make_optimizer(cfg2, inner=optax.sgd(LR))
    state2, tx2 = create_train_state(
        cfg2, model, mpd, sample_batch=b1, rng=init_key, tx=tx2
    )
    step2 = jax.jit(make_train_step(cfg2, model, mpd, tx2))
    mid, m_mid = step2(state2, b1, k0)
    assert _tree_max_diff(mid.params_g, state2.params_g) == 0.0
    assert _tree_max_diff(mid.params_d, state2.params_d) == 0.0
    assert int(mid.step) == 1  # micro-steps still count (rng/mas schedules)
    acc, _ = step2(mid, b2, k1)
    assert _tree_max_diff(acc.params_g, state2.params_g) > 0.0

    # oracle: two independent single steps from the same initial state
    tx1 = make_optimizer(cfg1, inner=optax.sgd(LR))
    state1, tx1 = create_train_state(
        cfg1, model, mpd, sample_batch=b1, rng=init_key, tx=tx1
    )
    assert _tree_max_diff(state1.params_g, state2.params_g) == 0.0
    step1 = jax.jit(make_train_step(cfg1, model, mpd, tx1))
    uA, _ = step1(state1, b1, k0)
    # micro-step 2 of the accumulating run sees step==1 (rng fold + mas
    # noise schedule) — mirror it
    state1b = state1.replace(step=jnp.asarray(1, jnp.int32))
    uB, _ = step1(state1b, b2, k1)

    for name in ("params_g", "params_d"):
        expected = jax.tree.map(
            lambda a, b: (a + b) / 2.0, getattr(uA, name), getattr(uB, name)
        )
        got = getattr(acc, name)
        diff = _tree_max_diff(got, expected)
        assert diff < 1e-6, f"{name}: max diff {diff}"


def test_grad_accum_sharded_matches_unsharded(rng):
    """The accumulating step under an 8-device data mesh produces the same
    parameters as unsharded (GSPMD only changes layout, not math). SGD inner
    optimizer, as in test_sharded_equivalence: Adam's first step is
    ~lr*sign(grad), which amplifies reduction-order noise on near-zero
    gradient entries past any tight tolerance."""
    import dataclasses

    import optax

    from torch_tts_tpu.train.vits2_train import make_optimizer, make_train_step

    assert len(jax.devices()) == 8
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, step_order="lightning", grad_accum=2
        )
    )
    model, mpd, dd, batch, state, _ = build_all(cfg, rng)
    tx = make_optimizer(cfg, inner=optax.sgd(0.1))
    state = state.replace(
        opt_g=tx.init(state.params_g), opt_d=tx.init(state.params_d)
    )
    step_jit = jax.jit(make_train_step(cfg, model, mpd, tx))
    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    s_ref, _ = step_jit(state, batch, k0)
    s_ref, _ = step_jit(s_ref, batch, k1)

    mesh = make_mesh()
    s_sh = replicate(state, mesh)
    b_sh = shard_batch(batch, mesh)
    s_sh, _ = step_jit(s_sh, b_sh, k0)
    s_sh, _ = step_jit(s_sh, b_sh, k1)

    assert _tree_max_diff(s_sh.params_g, s_ref.params_g) < 1e-5
    assert _tree_max_diff(s_sh.params_d, s_ref.params_d) < 1e-5


def test_grad_accum_state_checkpoint_roundtrip(rng, tmp_path):
    """MultiSteps optimizer state (incl. the mid-window grad accumulator)
    survives a checkpoint save/restore."""
    import dataclasses

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, step_order="lightning", grad_accum=2
        )
    )
    model, mpd, dd, batch, state, step_fn = build_all(cfg, rng)
    mid, _ = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(0))
    d = str(tmp_path)
    ckpt.save_checkpoint(d, 1, mid, keep=3)
    restored = ckpt.restore_checkpoint(ckpt.latest_checkpoint(d), state)
    assert _tree_max_diff(restored.opt_g, mid.opt_g) == 0.0


def test_reference_accumulate_grad_config_key(tmp_path):
    """The reference Lightning YAML's model.config.accumulate_grad maps to
    train.grad_accum (vits2/cli.py:190)."""
    from torch_tts_tpu.core.config import load_vits2_config

    p = tmp_path / "cfg.yaml"
    p.write_text(
        "model:\n  config:\n    hidden_channels: 192\n    accumulate_grad: 4\n"
        "data:\n  config: {}\n"
    )
    cfg = load_vits2_config(str(p))
    assert cfg.train.grad_accum == 4
