"""Pallas kernels (interpret mode on CPU): fused gated cell fwd/bwd parity
with autodiff, fused STFT+mel parity with the XLA frontend."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_tts_tpu.audio import mel as melmod
from torch_tts_tpu.kernels.gated_cell import lltm, lltm_ref, _lltm_fwd_pallas
from torch_tts_tpu.kernels.stft import mel_spectrogram_fused


def make_lltm_inputs(rng, B=4, I=6, H=8):
    x = jnp.asarray(rng.standard_normal((B, I)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3 * H, H + I)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.standard_normal((3 * H,)).astype(np.float32) * 0.1)
    h = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    return x, w, b, h, c


def test_lltm_forward_matches_ref(rng):
    args = make_lltm_inputs(rng)
    h1, c1 = lltm(*args)
    h2, c2 = lltm_ref(*args)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-5, atol=1e-6)


def test_lltm_pallas_kernel_interpret(rng):
    args = make_lltm_inputs(rng)
    h1, c1, gates = _lltm_fwd_pallas(*args, interpret=True)
    h2, c2 = lltm_ref(*args)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-5, atol=1e-6)


def test_lltm_analytic_backward_matches_autodiff(rng):
    args = make_lltm_inputs(rng)

    def loss_custom(*a):
        h, c = lltm(*a)
        return jnp.sum(h**2) + jnp.sum(jnp.sin(c))

    def loss_ref(*a):
        h, c = lltm_ref(*a)
        return jnp.sum(h**2) + jnp.sum(jnp.sin(c))

    g1 = jax.grad(loss_custom, argnums=(0, 1, 2, 3, 4))(*args)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fused_stft_mel_matches_xla(rng):
    y = (rng.standard_normal((2, 4096)) * 0.3).astype(np.float32)
    ref = melmod.mel_spectrogram(jnp.asarray(y), 256, 20, 8000, 64, 256)
    fused = mel_spectrogram_fused(
        jnp.asarray(y), 256, 20, 8000, 64, 256, block_frames=32, interpret=True
    )
    assert fused.shape == ref.shape
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=2e-3, atol=2e-4)


def make_taco_step_inputs(rng, B=2, L=12, Dmel=10, P=8, Dc=16, H1=12, H2=12, r=2):
    from torch_tts_tpu.kernels.taco_step import TacoStepState, TacoStepWeights

    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.3)
    wts = TacoStepWeights(
        prenet_w1=f(Dmel, P), prenet_b1=f(P), prenet_w2=f(P, P), prenet_b2=f(P),
        att_w_ih=f(P + Dc, 4 * H1), att_w_hh=f(H1, 4 * H1), att_b=f(4 * H1),
        query_w=f(H1, Dc),
        dec_w_ih=f(H1 + Dc, 4 * H2), dec_w_hh=f(H2, 4 * H2), dec_b=f(4 * H2),
        mel_w=f(H2 + Dc, r * Dmel), mel_b=f(r * Dmel),
        stop_w=f(H2 + Dc, r), stop_b=f(r),
    )
    w0 = jnp.zeros((B, L)).at[:, 0].set(1.0)
    state = TacoStepState(
        w=w0, ctx=f(B, Dc), h_att=f(B, H1), c_att=f(B, H1),
        h_dec=f(B, H2), c_dec=f(B, H2),
    )
    y_in = f(B, Dmel)
    memory = f(B, L, Dc)
    mmask = jnp.ones((B, L))
    return y_in, state, memory, mmask, wts


def test_fused_taco_step_matches_ref(rng):
    from torch_tts_tpu.kernels.taco_step import taco_step_fused, taco_step_ref

    y_in, state, memory, mmask, wts = make_taco_step_inputs(rng)
    y1, s1, ns1 = taco_step_ref(y_in, state, memory, mmask, wts)
    y2, s2, ns2 = taco_step_fused(y_in, state, memory, mmask, wts, interpret=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-5)
    for a, b in zip(ns1, ns2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
    # attention mass is conserved
    np.testing.assert_allclose(np.asarray(ns2.w.sum(-1)), 1.0, rtol=1e-5)


def test_streamed_taco_step_matches_ref(rng):
    """HBM-streamed variant (double-buffered weight DMA): exact vs the jnp
    reference in fp32; dims chosen so 4*H spans multiple n_tile=128 DMA
    tiles (the double-buffer loop actually rotates)."""
    from torch_tts_tpu.kernels.taco_step import taco_step_ref, taco_step_streamed

    y_in, state, memory, mmask, wts = make_taco_step_inputs(
        rng, H1=96, H2=64)
    y1, s1, ns1 = taco_step_ref(y_in, state, memory, mmask, wts)
    y2, s2, ns2 = taco_step_streamed(y_in, state, memory, mmask, wts,
                                     n_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5,
                               atol=1e-5)
    for a, b in zip(ns1, ns2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-5)
    # the B=1 VPU-gemv formulation is numerically the same contraction
    y_in1, state1, memory1, mmask1, _ = make_taco_step_inputs(
        rng, B=1, H1=96, H2=64)
    yr, sr, nsr = taco_step_ref(y_in1, state1, memory1, mmask1, wts)
    yv, sv, nsv = taco_step_streamed(y_in1, state1, memory1, mmask1, wts,
                                     n_tile=128, gemv="vpu", interpret=True)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yv), rtol=1e-5,
                               atol=1e-5)
    for a, b in zip(nsr, nsv):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-5)


def test_streamed_taco_step_bf16_weights(rng):
    """bf16 HBM weights halve the streamed bytes; outputs track the fp32
    reference to bf16 tolerance (activations/state stay fp32)."""
    import jax.numpy as jnp

    from torch_tts_tpu.kernels.taco_step import (
        TacoStepWeights, taco_step_ref, taco_step_streamed,
    )

    y_in, state, memory, mmask, wts = make_taco_step_inputs(
        rng, H1=96, H2=64)
    y1, s1, ns1 = taco_step_ref(y_in, state, memory, mmask, wts)
    wts16 = TacoStepWeights(*[
        w.astype(jnp.bfloat16) if name in
        ("att_w_ih", "att_w_hh", "dec_w_ih", "dec_w_hh") else w
        for name, w in zip(TacoStepWeights._fields, wts)
    ])
    y2, s2, ns2 = taco_step_streamed(y_in, state, memory, mmask, wts16,
                                     n_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=0.1,
                               atol=0.05)
    for a, b in zip(ns1, ns2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0.1,
                                   atol=0.05)


def test_fused_taco_step_matches_flax_cell(rng):
    """The kernel must reproduce the production flax cell (eval mode,
    dropout off)."""
    import unittest.mock as mock

    from torch_tts_tpu.kernels.taco_step import (
        TacoStepState, taco_step_ref, weights_from_cell_params,
    )
    from torch_tts_tpu.models.tacotron.model import Decoder
    from torch_tts_tpu.ops import layers as L

    B, L_mem, Dmel, Dc = 2, 9, 10, 16
    dec = Decoder(cell_type="tacotron2prod", dim_ctx=Dc, dim_mel=Dmel, r=2,
                  dim_rnn=(12, 12), dim_pre=8, dim_att=8)
    memory = jnp.asarray(rng.standard_normal((B, L_mem, Dc)).astype(np.float32))
    mmask = jnp.ones((B, L_mem), bool)
    x = jnp.asarray(rng.standard_normal((B, 4, Dmel)).astype(np.float32))
    variables = dec.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        memory, mmask, x=x, deterministic=False,
    )
    params = jax.device_get(variables["params"])

    with mock.patch.object(L.Dropout, "__call__",
                           lambda self, x_, deterministic=True, rng=None: x_):
        y_flax, s_flax, w_flax, _stop = dec.apply(
            variables, memory, mmask, x=x, deterministic=True,
            rngs={"dropout": jax.random.PRNGKey(0),
                  "noise": jax.random.PRNGKey(1)},
        )

    # replay the same teacher-forced rollout through the fused-step math
    wts = weights_from_cell_params(params["cell"], params)
    w0 = jnp.zeros((B, L_mem)).at[:, 0].set(1.0)
    state = TacoStepState(
        w=w0, ctx=jnp.zeros((B, Dc)),
        h_att=jnp.broadcast_to(params["init_h_0"], (B, 12)),
        c_att=jnp.broadcast_to(params["init_c_0"], (B, 12)),
        h_dec=jnp.broadcast_to(params["init_h_1"], (B, 12)),
        c_dec=jnp.broadcast_to(params["init_c_1"], (B, 12)),
    )
    mmask_f = mmask.astype(jnp.float32)
    y_in = jnp.zeros((B, Dmel))
    ys = []
    for t in range(2):  # S = 4 frames / r=2
        y, s, state = taco_step_ref(y_in, state, memory, mmask_f, wts)
        ys.append(y.reshape(B, 2, Dmel))
        y_in = x[:, 2 * t + 1]  # teacher: last frame of group t
    y_fused = jnp.concatenate(ys, axis=1)
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_flax), rtol=1e-4, atol=1e-5
    )
