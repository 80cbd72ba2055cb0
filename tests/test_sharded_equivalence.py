"""Sharded == unsharded numerical equivalence.

DDP's implicit guarantee (the reference all-reduces gradients inside each
backward, /root/reference/vits2/train.py:219-222) is that N-device training
computes the same update as 1-device training on the same global batch, up to
floating-point reduction order. These tests prove our GSPMD equivalent gives
the same guarantee for both model families:

- every loss/grad-norm metric of the jitted step matches between a
  single-device run and the same batch sharded over the 8-device mesh;
- with an SGD optimizer (update = -lr * grad, no curvature rescaling), the
  updated parameter trees match too — i.e. the *gradients* agree. (Adam's
  first step is ~lr * sign(grad), which amplifies reduction-order noise on
  near-zero gradient entries into +-2*lr param diffs; that is inherent to the
  optimizer and equally true of NCCL DDP, so gradient equality is asserted
  through SGD.)
"""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from torch_tts_tpu.parallel import make_mesh, replicate, shard_batch


def _max_leaf_diff(a, b):
    diffs = jax.tree.map(lambda x, y: float(jnp.max(jnp.abs(x - y))), a, b)
    return max(jax.tree.leaves(diffs))


def test_vits2_sharded_equals_unsharded(rng):
    from test_vits2_train_step import build_all, tiny_config
    from torch_tts_tpu.train.vits2_train import make_train_step

    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    cfg = tiny_config()
    model, mpd, dd, batch, state, _ = build_all(cfg, rng)

    # swap in SGD so updated params directly witness gradient equality
    tx = optax.sgd(0.1)
    state = state.replace(opt_g=tx.init(state.params_g), opt_d=tx.init(state.params_d))
    step_jit = jax.jit(make_train_step(cfg, model, mpd, tx))

    s1, m1 = step_jit(state, batch, jax.random.PRNGKey(0))

    mesh = make_mesh()
    s2, m2 = step_jit(
        replicate(state, mesh), shard_batch(batch, mesh), jax.random.PRNGKey(0)
    )

    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m2[k]), rtol=1e-5, atol=1e-5, err_msg=k
        )
    # params moved, and moved identically
    assert _max_leaf_diff(state.params_g, s1.params_g) > 1e-4
    assert _max_leaf_diff(s1.params_g, s2.params_g) < 1e-4
    assert _max_leaf_diff(s1.params_d, s2.params_d) < 1e-4


def test_tacotron_sharded_equals_unsharded(rng):
    from test_tacotron_model import TINY
    from torch_tts_tpu.models.tacotron import build_tacotron
    from torch_tts_tpu.train.tacotron_train import (
        create_train_state,
        make_train_step,
    )

    assert len(jax.devices()) == 8
    model = build_tacotron(TINY)
    B, T_c, T_x = 8, 12, 16
    batch = {
        "c": jnp.asarray(rng.integers(1, 10, (B, T_c)), jnp.int32),
        "c_lengths": jnp.asarray([T_c] * (B - 1) + [T_c - 3], jnp.int32),
        "x": jnp.asarray(
            rng.standard_normal((B, T_x, TINY.audio.num_mels)).astype(np.float32)
        ),
        "x_lengths": jnp.asarray([T_x] * (B - 1) + [T_x - 4], jnp.int32),
    }
    state, _ = create_train_state(TINY, model, batch)
    tx = optax.sgd(0.1)
    state = state.replace(opt=tx.init(state.params))
    step_jit = jax.jit(make_train_step(TINY, model, tx))

    s1, m1 = step_jit(state, batch, jax.random.PRNGKey(0))
    mesh = make_mesh()
    s2, m2 = step_jit(
        replicate(state, mesh), shard_batch(batch, mesh), jax.random.PRNGKey(0)
    )
    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m2[k]), rtol=1e-5, atol=1e-5, err_msg=k
        )
    assert _max_leaf_diff(state.params, s1.params) > 1e-4
    assert _max_leaf_diff(s1.params, s2.params) < 1e-4


def test_full_shape_sharded_step_compiles_aot(rng):
    """Round-1 weak-#6: the production-shape (batch 8, 1000-frame bucket,
    LJSpeech-size model) sharded train step has only ever been compiled
    single-device. AOT-compile it (.lower().compile(), no execution) against
    an 8-device mesh so the real-shape GSPMD partitioning is validated."""
    import jax.numpy as jnp
    import optax

    from torch_tts_tpu.core.config import VITS2Config
    from torch_tts_tpu.models.vits2 import (
        MultiPeriodDiscriminator,
        SynthesizerTrn,
    )
    from torch_tts_tpu.text import symbols
    from torch_tts_tpu.train.vits2_train import (
        TrainState,
        make_train_step,
        make_optimizer,
    )

    cfg = VITS2Config()  # canonical LJSpeech hyperparameters
    model = SynthesizerTrn(
        n_vocab=len(symbols), spec_channels=cfg.posterior_channels,
        segment_frames=cfg.segment_frames, cfg=cfg.model,
    )
    mpd = MultiPeriodDiscriminator(use_spectral_norm=cfg.model.use_spectral_norm)

    B, T_X, T_Y = 8, 192, 1000
    hop = cfg.audio.hop_length
    batch = {
        "x": jnp.zeros((B, T_X), jnp.int32),
        "x_lengths": jnp.full((B,), T_X, jnp.int32),
        "spec": jnp.zeros((B, T_Y, cfg.posterior_channels), jnp.float32),
        "spec_lengths": jnp.full((B,), T_Y, jnp.int32),
        "wav": jnp.zeros((B, T_Y * hop, 1), jnp.float32),
        "wav_lengths": jnp.full((B,), T_Y * hop, jnp.int32),
    }

    # abstract params (no real init): AOT lowering only needs avals
    k = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": k, "noise": k, "dropout": k},
            batch["x"], batch["x_lengths"], batch["spec"], batch["spec_lengths"],
        )
    )["params"]
    d_shapes = jax.eval_shape(
        lambda: mpd.init(
            {"params": k},
            jnp.zeros((B, cfg.model.segment_size, 1)),
            jnp.zeros((B, cfg.model.segment_size, 1)),
        )
    )["params"]
    tx = make_optimizer(cfg)
    opt_g = jax.eval_shape(lambda: tx.init(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)))
    opt_d = jax.eval_shape(lambda: tx.init(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), d_shapes)))
    state = TrainState(
        step=jax.ShapeDtypeStruct((), jnp.int32),
        params_g=shapes, opt_g=opt_g, params_d=d_shapes, opt_d=opt_d,
    )

    mesh = make_mesh()
    from torch_tts_tpu.parallel.mesh import batch_sharding, replicated

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    state_avals = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=rep), state
    )
    batch_avals = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=bsh), batch
    )
    key_aval = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep)

    step_fn = jax.jit(make_train_step(cfg, model, mpd, tx))
    compiled = step_fn.lower(state_avals, batch_avals, key_aval).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    assert float(cost.get("flops", 0.0)) > 1e11  # a real full-size step


def test_vits2_dur_disc_sharded_equals_unsharded(rng):
    """Round-2 weak-#5: the duration-discriminator branch (three optimizers)
    had never run sharded. Same sharded==unsharded gradient-equality witness
    as above, with dur_disc wired in — its metrics and its SGD-updated
    parameters must match across the 8-device mesh."""
    from test_vits2_train_step import build_all, tiny_config
    from torch_tts_tpu.train.vits2_train import make_train_step

    assert len(jax.devices()) == 8
    cfg = tiny_config(use_duration_discriminator=True)
    model, mpd, dd, batch, state, _ = build_all(cfg, rng, dur_disc_on=True)

    tx = optax.sgd(0.1)
    state = state.replace(
        opt_g=tx.init(state.params_g),
        opt_d=tx.init(state.params_d),
        opt_dur=tx.init(state.params_dur),
    )
    step_jit = jax.jit(make_train_step(cfg, model, mpd, tx, dur_disc=dd))

    s1, m1 = step_jit(state, batch, jax.random.PRNGKey(0))
    mesh = make_mesh()
    s2, m2 = step_jit(
        replicate(state, mesh), shard_batch(batch, mesh), jax.random.PRNGKey(0)
    )
    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m2[k]), rtol=1e-5, atol=1e-5, err_msg=k
        )
    assert _max_leaf_diff(state.params_dur, s1.params_dur) > 0
    assert _max_leaf_diff(s1.params_g, s2.params_g) < 1e-4
    assert _max_leaf_diff(s1.params_d, s2.params_d) < 1e-4
    assert _max_leaf_diff(s1.params_dur, s2.params_dur) < 1e-4
