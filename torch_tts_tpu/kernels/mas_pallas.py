"""Pallas TPU kernel for Monotonic Alignment Search.

One kernel for the whole batch: each forward-DP row step is a single
[B, T_x] VPU op (the batch rides the 8-wide sublanes), and the backtrack
advances every item's text index in parallel with one-hot selects — 2*T_y
loop iterations total for the entire batch. This replaces the reference's
host Cython round-trip (/root/reference/vits2/monotonic_align/__init__.py:
13-19) with a single on-device kernel inside the jitted training step.

VMEM economy: the DP value matrix is written into the *output* buffer and
overwritten in place by the backtrack (row y's one-hot is stored only after
row y-1's values are consumed), so the kernel needs no scratch — inputs +
outputs fit ~12.6 MB for the standard [8, 1024, 192] shape.

Lengths arrive as [B, T_x] broadcast int32 tensors (vector indexing of SMEM
scalars does not lower). Inputs must already be masked to MAX_NEG outside
the valid region (kernels/mas.py `maximum_path` does this).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torch_tts_tpu.kernels.mas import MAX_NEG


def _mas_kernel(nc_ref, tys_ref, txs_ref, path_ref):
    B, T_y, T_x = nc_ref.shape
    x_idx = jax.lax.broadcasted_iota(jnp.int32, (B, T_x), 1)
    t_ys = tys_ref[:]  # [B, T_x] broadcast
    t_xs = txs_ref[:]

    # --- forward DP (values stored in path_ref) ---
    nc0 = nc_ref[:, 0, :]
    path_ref[:, 0, :] = jnp.where(x_idx == 0, nc0, MAX_NEG)

    def fwd_body(y, _):
        prev = path_ref[:, y - 1, :]  # [B, T_x]
        nc_row = nc_ref[:, y, :]
        v_stay = jnp.where(x_idx == y, MAX_NEG, prev)
        v_adv = pltpu.roll(prev, 1, axis=1)
        v_adv = jnp.where(x_idx == 0, MAX_NEG, v_adv)
        row = jnp.maximum(nc_row + jnp.maximum(v_stay, v_adv), MAX_NEG)
        path_ref[:, y, :] = row
        return 0

    jax.lax.fori_loop(1, T_y, fwd_body, 0)

    # --- backtrack (in place: row y-1 still holds values when row y's
    # one-hot is written) ---
    def bwd_body(i, index):  # index [B, T_x]: per-item position, broadcast
        y = T_y - 1 - i
        active = y < t_ys
        prev = path_ref[:, jnp.maximum(y - 1, 0), :]  # values of row y-1
        v_here = jnp.sum(jnp.where(x_idx == index, prev, 0.0), axis=1,
                         keepdims=True)
        v_left = jnp.sum(
            jnp.where(x_idx == jnp.maximum(index - 1, 0), prev, 0.0), axis=1,
            keepdims=True,
        )
        onehot = jnp.logical_and(x_idx == index, active).astype(jnp.float32)
        path_ref[:, y, :] = onehot
        move = jnp.logical_or(index == y, v_here < v_left)
        take = jnp.logical_and(active, jnp.logical_and(index > 0, move))
        return jnp.where(take, index - 1, index)

    init_index = jnp.maximum(t_xs - 1, 0)
    jax.lax.fori_loop(0, T_y, bwd_body, init_index)


@functools.partial(jax.jit, static_argnames=("interpret",))
def maximum_path_pallas(
    neg_cent: jax.Array, t_ys: jax.Array, t_xs: jax.Array, interpret: bool = False
) -> jax.Array:
    """neg_cent: [B, T_y, T_x] (pre-masked to MAX_NEG) -> path [B, T_y, T_x]."""
    B, T_y, T_x = neg_cent.shape
    tys_bc = jnp.broadcast_to(t_ys.astype(jnp.int32)[:, None], (B, T_x))
    txs_bc = jnp.broadcast_to(t_xs.astype(jnp.int32)[:, None], (B, T_x))
    return pl.pallas_call(
        _mas_kernel,
        out_shape=jax.ShapeDtypeStruct((B, T_y, T_x), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * T_y * T_x, bytes_accessed=8 * B * T_y * T_x, transcendentals=0
        ),
    )(neg_cent.astype(jnp.float32), tys_bc, txs_bc)
