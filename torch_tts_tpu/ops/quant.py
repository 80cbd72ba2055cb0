"""Int8 quantized inference ops (W8A8, dynamic activation scaling).

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394.8 vs 197.4
TOPS), and int8 activations carry 1/4 the HBM bytes of fp32. The serving
path is compute-bound at batch >= 8 (BASELINE.md round 3), so the decoder's
wide conv stages are the one place quantization can buy real throughput —
this module provides the conv primitive and the policy lives in
ops/hifigan.py (`Generator(quant_int8=True)`: quantize the UNPACKED wide
stages; the packed narrow tail stays fp32 — it is bandwidth-bound and
already sits at its bytes floor).

Scheme (the standard dynamic-quant recipe, cf. AQT / PyTorch dynamic
quantization — reference repo has no quantized path at all; this is
beyond-parity):
- weights: per-output-channel symmetric int8. Scales fold into the conv
  epilogue. Under jit the weight quantization constant-folds at compile
  time (effective kernels are constants), so no parameter-tree change and
  reference checkpoints load unchanged.
- activations: per-tensor symmetric int8 with the scale computed on the
  fly (one max-reduction per conv input). No calibration pass needed, no
  accuracy cliff from stale ranges.
- accumulation in int32, dequantized in the epilogue: y = acc * s_x * s_w[c].

Quality is gated by tests/test_quant.py (random-weight SNR lower bounds)
and the serving A/B in BASELINE.md (trained-checkpoint waveform SNR + mel
distortion).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-12


def quantize_weight_per_channel(kernel: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[..., out] fp kernel -> (int8 kernel, fp32 per-out-channel scales)."""
    s_w = jnp.max(jnp.abs(kernel), axis=tuple(range(kernel.ndim - 1)))
    s_w = jnp.maximum(s_w, _EPS) / 127.0                       # [out]
    w_q = jnp.clip(jnp.round(kernel / s_w), -127, 127).astype(jnp.int8)
    return w_q, s_w.astype(jnp.float32)


def quantize_act_dynamic(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """fp activations -> (int8, scalar fp32 scale), symmetric per-tensor."""
    s_x = jnp.maximum(jnp.max(jnp.abs(x)), _EPS) / 127.0
    x_q = jnp.clip(jnp.round(x / s_x), -127, 127).astype(jnp.int8)
    return x_q, s_x.astype(jnp.float32)


def int8_conv1d(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array],
    *,
    stride: int = 1,
    padding: Tuple[int, int] = (0, 0),
    dilation: int = 1,
) -> jax.Array:
    """Quantized 1-D conv: x [B, T, C] fp; kernel [k, C, F] fp (quantized
    here — constant-folds under jit); fp32 output. Same contract as the
    fp conv in ops/layers.Conv1d's standard path (no groups/packing)."""
    w_q, s_w = quantize_weight_per_channel(kernel)
    x_q, s_x = quantize_act_dynamic(x)
    acc = jax.lax.conv_general_dilated(
        x_q,
        w_q,
        window_strides=(stride,),
        padding=[padding],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (s_x * s_w)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
