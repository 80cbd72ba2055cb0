"""Parity of primitive layers vs torch functional ops (the oracle the
reference is built on)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from torch_tts_tpu.ops import layers as L


def _run(mod, x, params):
    return np.asarray(mod.apply({"params": params}, jnp.asarray(x)))


@pytest.mark.parametrize(
    "k,stride,pad,dil,groups",
    [(5, 1, 2, 1, 1), (3, 2, 1, 1, 1), (3, 1, 3, 3, 1), (5, 1, 2, 1, 4), (1, 1, 0, 1, 1)],
)
def test_conv1d_matches_torch(rng, k, stride, pad, dil, groups):
    B, T, Cin, Cout = 2, 17, 8, 12
    x = rng.standard_normal((B, T, Cin)).astype(np.float32)
    w = rng.standard_normal((Cout, Cin // groups, k)).astype(np.float32) * 0.3
    b = rng.standard_normal((Cout,)).astype(np.float32)

    ref = F.conv1d(
        torch.from_numpy(x).transpose(1, 2),
        torch.from_numpy(w),
        torch.from_numpy(b),
        stride=stride,
        padding=pad,
        dilation=dil,
        groups=groups,
    ).transpose(1, 2).numpy()

    mod = L.Conv1d(Cout, k, stride=stride, padding=pad, dilation=dil, groups=groups)
    params = {"kernel": jnp.asarray(w.transpose(2, 1, 0)), "bias": jnp.asarray(b)}
    ours = _run(mod, x, params)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("k,stride,pad", [(16, 8, 4), (4, 2, 1), (3, 1, 1)])
def test_conv_transpose1d_matches_torch(rng, k, stride, pad):
    B, T, Cin, Cout = 2, 9, 6, 10
    x = rng.standard_normal((B, T, Cin)).astype(np.float32)
    w = rng.standard_normal((Cin, Cout, k)).astype(np.float32) * 0.3
    b = rng.standard_normal((Cout,)).astype(np.float32)

    ref = F.conv_transpose1d(
        torch.from_numpy(x).transpose(1, 2),
        torch.from_numpy(w),
        torch.from_numpy(b),
        stride=stride,
        padding=pad,
    ).transpose(1, 2).numpy()

    mod = L.ConvTranspose1d(Cout, k, stride=stride, padding=pad)
    # torch weight [in, out, k] -> ours [k, out, in]
    params = {"kernel": jnp.asarray(w.transpose(2, 1, 0)), "bias": jnp.asarray(b)}
    ours = _run(mod, x, params)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_weight_norm_conv1d_matches_torch(rng):
    B, T, Cin, Cout, k = 2, 13, 8, 16, 5
    x = rng.standard_normal((B, T, Cin)).astype(np.float32)
    conv = torch.nn.Conv1d(Cin, Cout, k, padding=2)
    conv = torch.nn.utils.weight_norm(conv)
    with torch.no_grad():
        ref = conv(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).numpy()

    g = conv.weight_g.detach().numpy().reshape(-1)  # [out]
    v = conv.weight_v.detach().numpy()  # [out, in, k]
    b = conv.bias.detach().numpy()
    mod = L.Conv1d(Cout, k, padding=2, weight_norm=True)
    params = {
        "v": jnp.asarray(v.transpose(2, 1, 0)),
        "g": jnp.asarray(g),
        "bias": jnp.asarray(b),
    }
    ours = _run(mod, x, params)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_weight_norm_conv_transpose1d_matches_torch(rng):
    B, T, Cin, Cout, k, stride, pad = 2, 7, 8, 4, 16, 8, 4
    x = rng.standard_normal((B, T, Cin)).astype(np.float32)
    conv = torch.nn.ConvTranspose1d(Cin, Cout, k, stride=stride, padding=pad)
    conv = torch.nn.utils.weight_norm(conv)
    with torch.no_grad():
        ref = conv(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).numpy()

    g = conv.weight_g.detach().numpy().reshape(-1)  # [in] (dim=0 of [in,out,k])
    v = conv.weight_v.detach().numpy()  # [in, out, k]
    b = conv.bias.detach().numpy()
    mod = L.ConvTranspose1d(Cout, k, stride=stride, padding=pad, weight_norm=True)
    params = {
        "v": jnp.asarray(v.transpose(2, 1, 0)),  # [k, out, in]
        "g": jnp.asarray(g),
        "bias": jnp.asarray(b),
    }
    ours = _run(mod, x, params)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_conv2d_matches_torch(rng):
    B, H, W, Cin, Cout = 2, 12, 5, 3, 7
    x = rng.standard_normal((B, H, W, Cin)).astype(np.float32)
    w = rng.standard_normal((Cout, Cin, 5, 1)).astype(np.float32) * 0.3
    b = rng.standard_normal((Cout,)).astype(np.float32)
    ref = F.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(w),
        torch.from_numpy(b),
        stride=(3, 1),
        padding=(2, 0),
    ).permute(0, 2, 3, 1).numpy()
    mod = L.Conv2d(Cout, (5, 1), stride=(3, 1), padding=(2, 0))
    params = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}
    ours = _run(mod, x, params)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_layernorm_matches_torch(rng):
    B, T, C = 2, 11, 32
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    gamma = rng.standard_normal((C,)).astype(np.float32)
    beta = rng.standard_normal((C,)).astype(np.float32)
    ref = F.layer_norm(
        torch.from_numpy(x), (C,), torch.from_numpy(gamma), torch.from_numpy(beta), 1e-5
    ).numpy()
    mod = L.LayerNorm()
    ours = _run(mod, x, {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)})
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_dense_and_embed_shapes(rng):
    x = jnp.asarray(rng.standard_normal((3, 5, 8)).astype(np.float32))
    mod = L.Dense(16)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    assert mod.apply({"params": params}, x).shape == (3, 5, 16)

    emb = L.Embed(100, 32, init_std=32**-0.5)
    ids = jnp.asarray([[1, 2, 3], [4, 5, 6]])
    p = emb.init(jax.random.PRNGKey(0), ids)["params"]
    assert emb.apply({"params": p}, ids).shape == (2, 3, 32)


def test_fused_gate_matches_torch(rng):
    B, T, C = 2, 7, 6
    a = rng.standard_normal((B, T, 2 * C)).astype(np.float32)
    b = rng.standard_normal((B, T, 2 * C)).astype(np.float32)
    s = torch.from_numpy(a + b)
    ref = (torch.tanh(s[..., :C]) * torch.sigmoid(s[..., C:])).numpy()
    ours = np.asarray(
        L.fused_add_tanh_sigmoid_multiply(jnp.asarray(a), jnp.asarray(b), C)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("k,stride,pad", [(16, 8, 4), (16, 16, 0), (4, 2, 1),
                                          (16, 4, 6)])
def test_conv_transpose1d_subpixel_equals_dilated(rng, k, stride, pad):
    """The subpixel (dense conv + depth-to-space) lowering is algebraically
    identical to the input-dilated lowering for every shipped
    (kernel, stride, padding) combination — incl. the mb_istft trunk's
    (16, 4, 6)."""
    B, T, Cin, Cout = 2, 11, 6, 10
    x = rng.standard_normal((B, T, Cin)).astype(np.float32)
    w = rng.standard_normal((k, Cout, Cin)).astype(np.float32) * 0.3
    b = rng.standard_normal((Cout,)).astype(np.float32)
    params = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}

    sub = _run(L.ConvTranspose1d(Cout, k, stride=stride, padding=pad,
                                 subpixel=True), x, params)
    dil = _run(L.ConvTranspose1d(Cout, k, stride=stride, padding=pad,
                                 subpixel=False), x, params)
    assert sub.shape == dil.shape == (B, T * stride, Cout)
    np.testing.assert_allclose(sub, dil, rtol=1e-5, atol=1e-6)
