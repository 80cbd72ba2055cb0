"""Primitive neural layers (flax.linen) with torch-compatible semantics.

Everything is channels-last: sequences are [B, T, C], images [B, H, W, C].
That puts the channel dim on the TPU lane dimension (128-wide) and lets XLA
tile convs/matmuls straight onto the MXU.

These layers mirror the parameterizations the reference relies on so that a
state-dict converter can map reference checkpoints 1:1:
- Conv1d/Dense use torch's default kaiming-uniform init bounds.
- `weight_norm=True` reproduces torch.nn.utils.weight_norm's (g, v)
  parameterization with the norm taken per output channel
  (torch dim=0 over [out, in, k] == our per-`out` norm over [k, in]).
- ConvTranspose1d follows torch's output-size convention
  out = (in-1)*stride - 2*pad + kernel.
- Spectral norm (used by discriminators when use_spectral_norm=True,
  /root/reference/vits2/models.py:982) is a one-step power iteration with the
  `u` vector kept in a mutable "spectral_stats" collection.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = jnp.dtype


def torch_uniform_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _norm_per_out(v: jax.Array) -> jax.Array:
    """L2 norm over all axes except the last (output-channel) axis."""
    axes = tuple(range(v.ndim - 1))
    return jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True))


class Dense(nn.Module):
    """Linear layer on the last axis; torch nn.Linear-compatible init."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kernel = self.param("kernel", torch_uniform_init(in_f), (in_f, self.features))
        y = jnp.matmul(x, kernel)
        if self.use_bias:
            bias = self.param("bias", torch_uniform_init(in_f), (self.features,))
            y = y + bias
        return y


class Embed(nn.Module):
    """Embedding lookup. `scale_init` sets init stddev (torch default 1.0)."""

    num_embeddings: int
    features: int
    init_std: float = 1.0

    @nn.compact
    def __call__(self, ids):
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=self.init_std),
            (self.num_embeddings, self.features),
        )
        return jnp.take(table, ids, axis=0)


class LayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis; eps matches the reference's
    channels-first LayerNorm (vits2/modules.py:17)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        gamma = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        beta = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return y * gamma + beta


class Conv1d(nn.Module):
    """1-D convolution, [B, T, C] -> [B, T', F].

    padding is a torch-style symmetric sample count (or an explicit (lo, hi)
    tuple). kernel layout: [k, in/groups, out].
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int | Tuple[int, int] = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    weight_norm: bool = False
    spectral_norm: bool = False
    kernel_init: Optional[nn.initializers.Initializer] = None
    bias_init: Optional[nn.initializers.Initializer] = None
    zero_init: bool = False  # reference zero-inits several projection convs
    # space-to-depth packing factor (ops/packed_conv.py): >1 computes the
    # same conv on [L/P, P*C] tensors to fill the 128-wide lanes when C is
    # narrow. Requires 'same' padding, stride 1, no groups, L % pack == 0.
    pack: int = 1
    # "int8": W8A8 dynamic-quant inference (ops/quant.py). Standard
    # (unpacked, ungrouped) path only; params unchanged (weight quant
    # constant-folds under jit).
    quant: Optional[str] = None

    def _kernel(self, in_ch: int):
        k = self.kernel_size
        fan_in = (in_ch // self.groups) * k
        shape = (k, in_ch // self.groups, self.features)
        if self.zero_init:
            init = nn.initializers.zeros
        elif self.kernel_init is not None:
            init = self.kernel_init
        else:
            init = torch_uniform_init(fan_in)
        if self.weight_norm:
            v = self.param("v", init, shape)
            g = self.param(
                "g",
                lambda key, s: _norm_per_out(init(key, shape)).reshape(s),
                (self.features,),
            )
            kernel = v * (g / jnp.maximum(_norm_per_out(v), 1e-12)).reshape(
                (1, 1, self.features)
            )
        else:
            kernel = self.param("kernel", init, shape)
        if self.spectral_norm:
            kernel = _spectral_normalize(self, kernel)
        return kernel, fan_in

    @nn.compact
    def __call__(self, x, input_pack: int = 1, return_kernel: bool = False):
        """input_pack > 1: x is ALREADY space-to-depth packed
        [B, L/P, P*C_in]; the conv runs in packed layout and returns packed
        [B, L/P, P*features] (decoder packed tail — same values, no unpacked
        intermediates). Requires 'same' padding, stride 1, no groups.

        return_kernel: create the SAME params but return the effective
        (weight/spectral-normed) kernel [k, in, out] and bias instead of
        running the conv — for fused multi-layer kernels (kernels/
        wn_stack.py) that consume the weights directly. x is only used for
        its channel count."""
        if return_kernel:
            in_ch = x.shape[-1] // input_pack
            kernel, fan_in = self._kernel(in_ch)
            bias = None
            if self.use_bias:
                binit = (nn.initializers.zeros if self.zero_init
                         else (self.bias_init or torch_uniform_init(fan_in)))
                bias = self.param("bias", binit, (self.features,))
            return kernel, bias
        if input_pack > 1:
            in_ch = x.shape[-1] // input_pack
            kernel, fan_in = self._kernel(in_ch)
            assert self.stride == 1 and self.groups == 1
            assert self.padding == (self.kernel_size * self.dilation - self.dilation) // 2, \
                "input_pack>1 requires 'same' padding"
            from torch_tts_tpu.ops.packed_conv import packed_conv1d_pre

            bias = None
            if self.use_bias:
                binit = (nn.initializers.zeros if self.zero_init
                         else (self.bias_init or torch_uniform_init(fan_in)))
                bias = self.param("bias", binit, (self.features,))
            return packed_conv1d_pre(
                x, kernel.astype(x.dtype),
                bias.astype(x.dtype) if bias is not None else None,
                self.dilation, input_pack,
            )
        in_ch = x.shape[-1]
        kernel, fan_in = self._kernel(in_ch)
        if self.pack > 1:
            assert self.stride == 1 and self.groups == 1
            assert self.padding == (self.kernel_size * self.dilation - self.dilation) // 2, \
                "pack>1 requires 'same' padding"
            from torch_tts_tpu.ops.packed_conv import packed_conv1d

            bias = None
            if self.use_bias:
                binit = (nn.initializers.zeros if self.zero_init
                         else (self.bias_init or torch_uniform_init(fan_in)))
                bias = self.param("bias", binit, (self.features,))
            return packed_conv1d(
                x, kernel.astype(x.dtype),
                bias.astype(x.dtype) if bias is not None else None,
                self.dilation, self.pack,
            )
        pad = self.padding
        if isinstance(pad, int):
            pad = (pad, pad)
        if self.quant == "int8":
            assert self.groups == 1, "int8 path has no grouped-conv support"
            from torch_tts_tpu.ops.quant import int8_conv1d

            bias = None
            if self.use_bias:
                binit = (nn.initializers.zeros if self.zero_init
                         else (self.bias_init or torch_uniform_init(fan_in)))
                bias = self.param("bias", binit, (self.features,))
            return int8_conv1d(
                x, kernel, bias,
                stride=self.stride, padding=pad, dilation=self.dilation,
            )
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(self.stride,),
            padding=[pad],
            rhs_dilation=(self.dilation,),
            feature_group_count=self.groups,
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            binit = (nn.initializers.zeros if self.zero_init
                     else (self.bias_init or torch_uniform_init(fan_in)))
            bias = self.param("bias", binit, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class ConvTranspose1d(nn.Module):
    """Transposed 1-D convolution with torch semantics.

    out_len = (in_len - 1) * stride - 2 * padding + kernel_size.
    kernel param layout is [k, out, in] (matching torch's ConvTranspose1d
    [in, out, k] modulo transpose) so weight-norm's per-channel norm matches
    torch dim=0 (= the *input*-channel axis for transposed convs).

    Lowering (TPU): by default (`subpixel=None` = auto) the op is computed as
    a SUBPIXEL convolution — one dense stride-1 conv producing stride*out
    features per input frame, then depth-to-space — instead of the standard
    input-dilated conv. The two are algebraically identical
    (y[s*u + r] = sum_q x[s-q] * K[q*u + r + p]; the dense kernel packs the
    per-phase taps K[q*u + r + p] as feature block r), but the dilated form
    makes the MXU multiply the inserted zeros: its conv reads k taps per
    OUTPUT sample (T*u*k MACs/channel-pair) where only k/u are nonzero, while
    the subpixel form does T*(k+u) — an ~stride-fold FLOP reduction at
    stride 8. Auto applies when out_len == in_len*stride (true for every
    shipped config: k=2u p=u/2, and the mb_istft trunk k=16 u=4 p=6);
    otherwise the dilated path runs. Equivalence is asserted by
    tests/test_ops_layers.py against the dilated reference path.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    weight_norm: bool = False
    subpixel: Optional[bool] = None  # None = auto
    # "int8": W8A8 dynamic-quant inference on the subpixel path (the dense
    # stride-1 conv carries all the FLOPs); dilated fallback stays fp.
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, input_pack: int = 1, keep_packed: bool = False):
        """input_pack > 1: x is space-to-depth packed [B, L/P, P*C_in]; the
        transposed conv runs fully packed and returns a (P*stride)-packed
        output [B, L/P, P*stride*features]. keep_packed with input_pack == 1
        returns the natural stride-packed subpixel output [B, L, stride*
        features] without the final depth-to-space reshape. Both require the
        subpixel geometry (out_len == in_len*stride)."""
        packed = input_pack > 1 or keep_packed
        in_ch = x.shape[-1] // (input_pack if input_pack > 1 else 1)
        k = self.kernel_size
        u = self.stride
        p = self.padding
        fan_in = self.features * k // 1  # torch fan_in for transposed: out*k/groups
        shape = (k, self.features, in_ch)  # [k, out, in]
        init = torch_uniform_init(fan_in)
        if self.weight_norm:
            v = self.param("v", init, shape)
            # torch weight_norm dim=0 on [in, out, k]: norm over (out, k) per in-channel
            def g_init(key, s):
                w = init(key, shape)
                return jnp.sqrt(jnp.sum(w * w, axis=(0, 1))).reshape(s)

            g = self.param("g", g_init, (in_ch,))
            norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True))
            kernel = v * (g.reshape((1, 1, in_ch)) / jnp.maximum(norm, 1e-12))
        else:
            kernel = self.param("kernel", init, shape)

        if packed:
            assert (k - u - 2 * p) == 0, (
                "packed ConvTranspose1d requires out_len == in_len*stride "
                f"(k={k}, stride={u}, padding={p})"
            )
            from torch_tts_tpu.ops.packed_conv import (
                packed_subpixel_transposed_conv,
            )

            bias = None
            if self.use_bias:
                bias = self.param(
                    "bias", torch_uniform_init(fan_in), (self.features,)
                )
            return packed_subpixel_transposed_conv(
                x, kernel.astype(x.dtype),
                bias.astype(x.dtype) if bias is not None else None,
                u, p, max(input_pack, 1),
            )

        use_subpixel = self.subpixel
        if use_subpixel is None:
            # auto: only when the subpixel output needs no tail adjustment
            use_subpixel = u > 1 and (k - u - 2 * p) == 0
        if use_subpixel:
            assert (k - u - 2 * p) == 0, (
                "subpixel ConvTranspose1d requires out_len == in_len*stride "
                f"(k={k}, stride={u}, padding={p})"
            )
            y = self._subpixel(x, kernel, in_ch)
        else:
            # input-dilated conv: pad = k - 1 - padding each side, kernel flipped
            flipped = jnp.flip(kernel, axis=0)  # [k, out, in]
            flipped = jnp.swapaxes(flipped, 1, 2)  # -> [k, in, out] WIO
            pad = k - 1 - p
            y = jax.lax.conv_general_dilated(
                x,
                flipped.astype(x.dtype),
                window_strides=(1,),
                padding=[(pad, pad)],
                lhs_dilation=(u,),
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
        if self.use_bias:
            bias = self.param("bias", torch_uniform_init(fan_in), (self.features,))
            y = y + bias.astype(y.dtype)
        return y

    def _subpixel(self, x, kernel, in_ch):
        """Dense stride-1 conv + depth-to-space; exact transposed-conv values."""
        k, u, p = self.kernel_size, self.stride, self.padding
        C_out = self.features
        B, T, _ = x.shape
        q_min = -((p + u - 1) // u)
        q_max = (k - 1 - p) // u
        W_len = q_max - q_min + 1
        # a_idx[w, r] = (q_max - w)*u + r + p : original-kernel tap index for
        # correlation position w, output phase r
        a_idx = (q_max - np.arange(W_len))[:, None] * u + np.arange(u)[None, :] + p
        valid = (a_idx >= 0) & (a_idx < k)
        a_clamped = np.clip(a_idx, 0, k - 1)
        KG = kernel[a_clamped.reshape(-1)]  # [(W_len*u), out, in]
        KG = KG.reshape(W_len, u, C_out, in_ch)
        KG = jnp.where(jnp.asarray(valid)[..., None, None], KG, 0.0)
        # -> WIO with feature blocks ordered [phase, out]
        DK = jnp.transpose(KG, (0, 3, 1, 2)).reshape(W_len, in_ch, u * C_out)
        if self.quant == "int8":
            from torch_tts_tpu.ops.quant import int8_conv1d

            # per-channel scales live on the u*C_out dense axis, so every
            # (phase, out) pair gets its own scale — finer than per-out
            y = int8_conv1d(x, DK, None, padding=(q_max, -q_min))
        else:
            y = jax.lax.conv_general_dilated(
                x,
                DK.astype(x.dtype),
                window_strides=(1,),
                padding=[(q_max, -q_min)],
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
        return y.reshape(B, T * u, C_out)


class Conv2d(nn.Module):
    """2-D convolution, [B, H, W, C] -> [B, H', W', F]; torch-style padding."""

    features: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    weight_norm: bool = False
    spectral_norm: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        fan_in = in_ch * kh * kw
        shape = (kh, kw, in_ch, self.features)
        init = torch_uniform_init(fan_in)
        if self.weight_norm:
            v = self.param("v", init, shape)

            def g_init(key, s):
                w = init(key, shape)
                return jnp.sqrt(jnp.sum(w * w, axis=(0, 1, 2))).reshape(s)

            g = self.param("g", g_init, (self.features,))
            norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2), keepdims=True))
            kernel = v * (g.reshape((1, 1, 1, self.features)) / jnp.maximum(norm, 1e-12))
        else:
            kernel = self.param("kernel", init, shape)
        if self.spectral_norm:
            kernel = _spectral_normalize(self, kernel)
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=self.stride,
            padding=[(self.padding[0],) * 2, (self.padding[1],) * 2],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", torch_uniform_init(fan_in), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def _spectral_normalize(mod: nn.Module, kernel: jax.Array) -> jax.Array:
    """One-step power-iteration spectral norm (torch.nn.utils.spectral_norm).

    The `u` estimate lives in the "spectral_stats" collection; it is updated
    when that collection is mutable (training) and frozen otherwise.
    """
    out_f = kernel.shape[-1]
    w = kernel.reshape(-1, out_f)  # [N, out]
    u_var = mod.variable(
        "spectral_stats",
        "u",
        lambda: jax.random.normal(jax.random.PRNGKey(0), (out_f,)),
    )
    u = u_var.value
    v = w @ u
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
    u_new = w.T @ v
    u_new = u_new / jnp.maximum(jnp.linalg.norm(u_new), 1e-12)
    sigma = jnp.dot(v, w @ u_new)
    if not mod.is_initializing() and not mod.is_mutable_collection("spectral_stats"):
        u_new = u
        sigma = jnp.dot(v, w @ u)
    else:
        u_var.value = jax.lax.stop_gradient(u_new)
    return kernel / jnp.maximum(sigma, 1e-12)


class Dropout(nn.Module):
    """Dropout with explicit deterministic flag (rng stream: 'dropout').

    An explicit `rng` overrides the module stream — used by the tacotron AR
    decoder so per-step masks are a pure function of (key, step index) and a
    chunked decode reproduces the monolithic scan bit-for-bit
    (models/tacotron/model.py decode_chunk)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool, rng=None):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        if rng is None:
            rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)


def leaky_relu(x, slope: float = 0.1):
    """Default slope 0.1 matches the reference's LRELU_SLOPE (vits2/modules.py:14)."""
    return jnp.where(x >= 0, x, x * slope)


def fused_add_tanh_sigmoid_multiply(a, b, n_channels: int):
    """Gated activation tanh(x[:n]) * sigmoid(x[n:]) (vits2/commons.py:102).

    Channels-last: a, b are [B, T, 2*n_channels].
    """
    s = a + b
    t_act = jnp.tanh(s[..., :n_channels])
    s_act = jax.nn.sigmoid(s[..., n_channels:])
    return t_act * s_act
