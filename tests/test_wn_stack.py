"""Fused WN stack kernel (kernels/wn_stack.py) vs the XLA WN path.

The fused path consumes the SAME parameter tree as the layerwise XLA path
(ops/wavenet.py collects effective weights via Conv1d(return_kernel=True)),
so parity here is: init once, run both paths on identical inputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_tts_tpu.kernels.wn_stack import (
    _stack_ref,
    _wn_group_pallas,
    _wn_group_pallas_bwd,
    wn_group_ref,
    wn_stack,
)
from torch_tts_tpu.ops.wavenet import WN


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _wn_pair(rng, B=2, T=57, H=16, L=4, k=5, gin=0, valid=(57, 40)):
    x = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))
    mask = (jnp.arange(T)[None, :, None]
            < jnp.asarray(valid)[:B, None, None]).astype(jnp.float32)
    g = None
    if gin:
        g = jnp.asarray(rng.standard_normal((B, 1, gin)).astype(np.float32))
    wn = WN(H, k, 1, L, gin_channels=gin, fused=False)
    variables = wn.init(jax.random.PRNGKey(0), x, mask, g=g)
    return x, mask, g, variables


@pytest.mark.parametrize("gin", [0, 8])
@pytest.mark.parametrize("L", [3, 4, 6])
def test_fused_matches_layerwise(rng, L, gin):
    """WN(fused=True) == WN(fused=False) on the same params (CPU: reference
    stack math; the group chaining and final-layer padding are exercised)."""
    x, mask, g, variables = _wn_pair(rng, L=L, gin=gin)
    wn_x = WN(16, 5, 1, L, gin_channels=gin, fused=False)
    wn_f = WN(16, 5, 1, L, gin_channels=gin, fused=True)
    ref = wn_x.apply(variables, x, mask, g=g)
    out = wn_f.apply(variables, x, mask, g=g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_fused_falls_back_on_dilation(rng):
    """dilation_rate != 1 must silently use the XLA path (identical out)."""
    B, T, H, L = 1, 33, 8, 3
    x = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))
    mask = jnp.ones((B, T, 1), jnp.float32)
    wn_x = WN(H, 5, 2, L, fused=False)
    variables = wn_x.init(jax.random.PRNGKey(0), x, mask)
    out = WN(H, 5, 2, L, fused=True).apply(variables, x, mask)
    ref = wn_x.apply(variables, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("T,tile", [(64, 32), (57, 32), (30, 128), (128, 32)])
def test_pallas_group_matches_ref(rng, T, tile):
    """Interpret-mode Pallas group == jnp reference, including ragged tails
    and single-window sequences."""
    B, H, L, k = 2, 8, 3, 5
    x = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))
    mask = (jnp.arange(T)[None, :, None]
            < jnp.asarray([T, max(1, T - 9)])[:, None, None]).astype(jnp.float32)
    gl = jnp.asarray(rng.standard_normal((B, L, 2 * H)).astype(np.float32))
    w_in = jnp.asarray(
        rng.standard_normal((L, k, H, 2 * H)).astype(np.float32)) * 0.3
    b_in = jnp.asarray(rng.standard_normal((L, 2 * H)).astype(np.float32)) * 0.1
    w_rs = jnp.asarray(
        rng.standard_normal((L, H, 2 * H)).astype(np.float32)) * 0.3
    b_rs = jnp.asarray(rng.standard_normal((L, 2 * H)).astype(np.float32)) * 0.1

    x_ref, sk_ref = wn_group_ref(x, mask, gl, w_in, b_in, w_rs, b_rs)
    x_out, sk_out = _wn_group_pallas(x, mask, gl, w_in, b_in, w_rs, b_rs,
                                     tile=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(x_out), np.asarray(x_ref),
                               atol=2e-5, rtol=1e-5)
    # kernel masks its skip output; compare where the final WN mask applies
    np.testing.assert_allclose(np.asarray(sk_out * mask),
                               np.asarray(sk_ref * mask),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("T,tile", [(64, 32), (57, 32), (30, 128)])
def test_pallas_backward_matches_autodiff(rng, T, tile):
    """Interpret-mode Pallas backward kernel == jax.vjp of the reference:
    d_x, d_gl, and every weight/bias grad, with ragged tails and a real
    mask (central-position accumulation must count each frame once)."""
    B, H, L, k = 2, 8, 3, 5
    x = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))
    mask = (jnp.arange(T)[None, :, None]
            < jnp.asarray([T, max(1, T - 9)])[:, None, None]).astype(jnp.float32)
    gl = jnp.asarray(rng.standard_normal((B, L, 2 * H)).astype(np.float32))
    w_in = jnp.asarray(
        rng.standard_normal((L, k, H, 2 * H)).astype(np.float32)) * 0.3
    b_in = jnp.asarray(rng.standard_normal((L, 2 * H)).astype(np.float32)) * 0.1
    w_rs = jnp.asarray(
        rng.standard_normal((L, H, 2 * H)).astype(np.float32)) * 0.3
    b_rs = jnp.asarray(rng.standard_normal((L, 2 * H)).astype(np.float32)) * 0.1
    d_xo = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))
    d_sk = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))

    _, vjp = jax.vjp(
        lambda x_, gl_, w1, bb1, w2, bb2: wn_group_ref(
            x_, mask, gl_, w1, bb1, w2, bb2
        ),
        x, gl, w_in, b_in, w_rs, b_rs,
    )
    want = vjp((d_xo, d_sk))
    got = _wn_group_pallas_bwd(x, mask, gl, w_in, b_in, w_rs, b_rs,
                               d_xo, d_sk, tile=tile, interpret=True)
    # got: (d_x, d_gl, d_w_in, d_b_in, d_w_rs, d_b_rs); want ordered
    # (d_x, d_gl, d_w_in, d_b_in, d_w_rs, d_b_rs) by the vjp lambda args
    names = ["d_x", "d_gl", "d_w_in", "d_b_in", "d_w_rs", "d_b_rs"]
    for name, a, b in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4,
            err_msg=name,
        )


def test_wn_stack_gradients_match_autodiff(rng):
    """custom_vjp backward == jax.grad of the layerwise WN (same params)."""
    x, mask, g, variables = _wn_pair(rng, L=4, gin=8)
    wn_x = WN(16, 5, 1, 4, gin_channels=8, fused=False)
    wn_f = WN(16, 5, 1, 4, gin_channels=8, fused=True)

    def loss(mod):
        def f(params, xx):
            out = mod.apply({"params": params}, xx, mask, g=g)
            return jnp.sum(out * out)
        return f

    g_ref = jax.grad(loss(wn_x), argnums=(0, 1))(variables["params"], x)
    g_fus = jax.grad(loss(wn_f), argnums=(0, 1))(variables["params"], x)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_f, _ = jax.tree_util.tree_flatten(g_fus)
    assert len(flat_r) == len(flat_f)
    for a, b in zip(flat_f, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=2e-4)


def test_stack_ref_group_chaining(rng):
    """Chained groups (group=2) == one monolithic group (group=L)."""
    B, T, H, L, k = 1, 40, 8, 6, 5
    x = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))
    mask = jnp.ones((B, T, 1), jnp.float32)
    w_in = jnp.asarray(
        rng.standard_normal((L, k, H, 2 * H)).astype(np.float32)) * 0.3
    b_in = jnp.zeros((L, 2 * H), jnp.float32)
    w_rs = jnp.asarray(
        rng.standard_normal((L, H, 2 * H)).astype(np.float32)) * 0.3
    b_rs = jnp.zeros((L, 2 * H), jnp.float32)
    a = _stack_ref(x, mask, None, w_in, b_in, w_rs, b_rs, group=2)
    b = _stack_ref(x, mask, None, w_in, b_in, w_rs, b_rs, group=L)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=1e-5)


def test_wn_stack_jits(rng):
    """wn_stack under jit (CPU backend -> reference path) compiles and
    differentiates."""
    x, mask, g, variables = _wn_pair(rng, L=4, gin=0)
    wn_f = WN(16, 5, 1, 4, fused=True)

    @jax.jit
    def f(params, xx):
        return jnp.sum(wn_f.apply({"params": params}, xx, mask) ** 2)

    v = f(variables["params"], x)
    gr = jax.jit(jax.grad(f))(variables["params"], x)
    assert np.isfinite(float(v))
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(gr))
