"""Pallas TPU kernel for Monotonic Alignment Search.

One grid program per batch item; the whole DP matrix lives in VMEM scratch so
the forward recurrence and the backtrack never touch HBM between rows. This
replaces the reference's host Cython round-trip
(/root/reference/vits2/monotonic_align/__init__.py:13-19) with a single
on-device kernel in the middle of the jitted training step.

Kernel structure:
  forward:  fori_loop over frame rows y = 1..T_y-1; each step is a [1, T_x]
            vector max over the shifted/unshifted previous row (VPU work).
  backtrack: fori_loop walking y = T_y-1..0 with the current text index in
            SMEM, emitting one-hot rows (predicated on y < t_y).

Lengths (t_ys, t_xs) arrive via PrefetchScalarGridSpec so they are available
for control flow. Inputs must already be masked to MAX_NEG outside
[0, t_y) x [0, t_x) (maximum_path in kernels/mas.py does this).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torch_tts_tpu.kernels.mas import MAX_NEG


def _mas_kernel(t_ys_ref, t_xs_ref, nc_ref, path_ref, value_ref):
    b = pl.program_id(0)
    t_y = t_ys_ref[b]
    t_x = t_xs_ref[b]
    T_y, T_x = value_ref.shape

    x_idx = jax.lax.broadcasted_iota(jnp.int32, (1, T_x), 1)

    # --- forward DP ---
    nc0 = nc_ref[0, 0, :].reshape(1, T_x)
    value_ref[0:1, :] = jnp.where(x_idx == 0, nc0, MAX_NEG)

    def fwd_body(y, _):
        prev = value_ref[pl.ds(y - 1, 1), :]  # [1, T_x]
        nc_row = nc_ref[0, pl.ds(y, 1), :]  # [1, T_x]
        v_stay = jnp.where(x_idx == y, MAX_NEG, prev)
        v_adv = pltpu.roll(prev, 1, axis=1)
        v_adv = jnp.where(x_idx == 0, MAX_NEG, v_adv)
        row = nc_row + jnp.maximum(v_stay, v_adv)
        row = jnp.maximum(row, MAX_NEG)
        value_ref[pl.ds(y, 1), :] = row
        return 0

    jax.lax.fori_loop(1, T_y, fwd_body, 0)

    # --- backtrack ---
    def bwd_body(i, index):
        y = T_y - 1 - i
        active = y < t_y
        onehot = jnp.logical_and(x_idx == index, active).astype(jnp.float32)
        path_ref[0, pl.ds(y, 1), :] = onehot
        prev = value_ref[pl.ds(jnp.maximum(y - 1, 0), 1), :]  # [1, T_x]
        v_here = jnp.sum(jnp.where(x_idx == index, prev, 0.0))
        v_left = jnp.sum(jnp.where(x_idx == jnp.maximum(index - 1, 0), prev, 0.0))
        move = jnp.logical_or(index == y, v_here < v_left)
        take = jnp.logical_and(active, jnp.logical_and(index > 0, move))
        return jnp.where(take, index - 1, index)

    jax.lax.fori_loop(0, T_y, bwd_body, jnp.maximum(t_x - 1, 0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def maximum_path_pallas(
    neg_cent: jax.Array, t_ys: jax.Array, t_xs: jax.Array, interpret: bool = False
) -> jax.Array:
    """neg_cent: [B, T_y, T_x] (pre-masked to MAX_NEG) -> path [B, T_y, T_x]."""
    B, T_y, T_x = neg_cent.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T_y, T_x), lambda b, *_: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T_y, T_x), lambda b, *_: (b, 0, 0)),
        scratch_shapes=[pltpu.VMEM((T_y, T_x), jnp.float32)],
    )
    return pl.pallas_call(
        _mas_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T_y, T_x), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * T_y * T_x, bytes_accessed=8 * B * T_y * T_x, transcendentals=0
        ),
    )(t_ys.astype(jnp.int32), t_xs.astype(jnp.int32), neg_cent.astype(jnp.float32))
