"""Fused gated recurrent cell (LLTM) with hand-written backward.

TPU-native equivalent of the reference's C++ autograd extension
(/root/reference/src/lltm-extension/lltm.cpp): the forward fuses the gate
matmul with the sigmoid/ELU/tanh cell update (lltm.cpp:8-33), and the
backward is the same analytic gradient chain (lltm.cpp:52-87) written as a
`jax.custom_vjp` pair — the JAX-native analogue of registering fwd/bwd
through pybind11.

Two implementations, cross-validated in tests:
- `lltm_ref`: plain jnp (autodiff'able; the parity oracle)
- `lltm`: custom_vjp with a Pallas forward kernel (matmul on MXU, gate
  nonlinearities fused in the epilogue) and an analytic backward.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _elu(x):
    # exp - 1 instead of expm1: Mosaic has no expm1 lowering, and the
    # precision difference is irrelevant at ELU scales
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _d_sigmoid(z):
    s = jax.nn.sigmoid(z)
    return s * (1 - s)


def _d_elu(z):
    return jnp.where(z > 0, 1.0, jnp.exp(z))


def _d_tanh(z):
    return 1.0 - jnp.tanh(z) ** 2


def lltm_ref(x, weights, bias, old_h, old_cell):
    """Reference implementation. x [B, I], weights [3H, H+I], bias [3H],
    old_h/old_cell [B, H] -> (new_h, new_cell)."""
    X = jnp.concatenate([old_h, x], axis=1)
    gates = X @ weights.T + bias
    H = old_h.shape[1]
    input_gate = jax.nn.sigmoid(gates[:, :H])
    output_gate = jax.nn.sigmoid(gates[:, H : 2 * H])
    candidate = _elu(gates[:, 2 * H :])
    new_cell = old_cell + candidate * input_gate
    new_h = jnp.tanh(new_cell) * output_gate
    return new_h, new_cell


# ---------------------------------------------------------------------------
# Pallas forward
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, w_ref, b_ref, h_ref, c_ref,
                new_h_ref, new_c_ref, gates_ref):
    X = jnp.concatenate([h_ref[:], x_ref[:]], axis=1)  # [B, H+I]
    gates = (
        jnp.dot(X, w_ref[:].T, preferred_element_type=jnp.float32) + b_ref[:]
    )
    H = h_ref.shape[1]
    gates_ref[:] = gates
    ig = jax.nn.sigmoid(gates[:, :H])
    og = jax.nn.sigmoid(gates[:, H : 2 * H])
    cand = _elu(gates[:, 2 * H :])
    new_c = c_ref[:] + cand * ig
    new_c_ref[:] = new_c
    new_h_ref[:] = jnp.tanh(new_c) * og


def _lltm_fwd_pallas(x, weights, bias, old_h, old_cell, interpret=False):
    B, I = x.shape
    H = old_h.shape[1]
    out_shapes = (
        jax.ShapeDtypeStruct((B, H), jnp.float32),  # new_h
        jax.ShapeDtypeStruct((B, H), jnp.float32),  # new_cell
        jax.ShapeDtypeStruct((B, 3 * H), jnp.float32),  # raw gates (residual)
    )
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=out_shapes,
        interpret=interpret,
    )(x.astype(jnp.float32), weights.astype(jnp.float32),
      bias.astype(jnp.float32), old_h.astype(jnp.float32),
      old_cell.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def lltm(x, weights, bias, old_h, old_cell):
    """Fused cell with analytic VJP. Same contract as lltm_ref."""
    new_h, new_cell, _ = _lltm_fwd(x, weights, bias, old_h, old_cell)
    return new_h, new_cell


def _lltm_fwd(x, weights, bias, old_h, old_cell):
    if jax.default_backend() == "tpu":
        return _lltm_fwd_pallas(x, weights, bias, old_h, old_cell)
    # CPU/GPU: same math via XLA
    X = jnp.concatenate([old_h, x], axis=1)
    gates = X @ weights.T + bias
    H = old_h.shape[1]
    ig = jax.nn.sigmoid(gates[:, :H])
    og = jax.nn.sigmoid(gates[:, H : 2 * H])
    cand = _elu(gates[:, 2 * H :])
    new_cell = old_cell + cand * ig
    new_h = jnp.tanh(new_cell) * og
    return new_h, new_cell, gates


def _lltm_vjp_fwd(x, weights, bias, old_h, old_cell):
    new_h, new_cell, gates = _lltm_fwd(x, weights, bias, old_h, old_cell)
    X = jnp.concatenate([old_h, x], axis=1)
    residuals = (X, gates, new_cell, weights, old_h.shape[1])
    return (new_h, new_cell), residuals


def _lltm_vjp_bwd(residuals, grads):
    """Analytic backward mirroring lltm.cpp:52-87."""
    X, gates, new_cell, weights, H = residuals
    grad_h, grad_cell = grads
    ig_z = gates[:, :H]
    og_z = gates[:, H : 2 * H]
    cand_z = gates[:, 2 * H :]
    input_gate = jax.nn.sigmoid(ig_z)
    output_gate = jax.nn.sigmoid(og_z)
    candidate = _elu(cand_z)

    d_output_gate = jnp.tanh(new_cell) * grad_h
    d_tanh_new_cell = output_gate * grad_h
    d_new_cell = _d_tanh(new_cell) * d_tanh_new_cell + grad_cell

    d_old_cell = d_new_cell
    d_candidate = input_gate * d_new_cell
    d_input_gate = candidate * d_new_cell

    d_gates = jnp.concatenate(
        [
            d_input_gate * _d_sigmoid(ig_z),
            d_output_gate * _d_sigmoid(og_z),
            d_candidate * _d_elu(cand_z),
        ],
        axis=1,
    )
    d_weights = d_gates.T @ X
    d_bias = jnp.sum(d_gates, axis=0)
    d_X = d_gates @ weights
    d_old_h = d_X[:, :H]
    d_input = d_X[:, H:]
    return d_input, d_weights, d_bias, d_old_h, d_old_cell


lltm.defvjp(_lltm_vjp_fwd, _lltm_vjp_bwd)
