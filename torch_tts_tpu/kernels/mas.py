"""Monotonic Alignment Search (MAS) — on-device Viterbi DP.

The reference computes MAS on the host: GPU tensors are copied to numpy,
a Cython kernel runs the DP per batch item under OpenMP, and the result is
copied back (/root/reference/vits2/monotonic_align/__init__.py:13-19,
core.pyx:7-42) — a device->host->device round-trip in the middle of every
VITS2 training step. Here the same DP runs entirely on the TPU:

- `maximum_path_scan`: a `lax.scan` over frame rows, vectorized over
  (batch, text) — O(T_y) sequential steps of [B, T_x] vector ops, then a
  reverse scan for the backtrack. Used as the reference implementation and
  the CPU/interpret fallback.
- `maximum_path_pallas` (kernels/mas_pallas.py): one Pallas kernel per batch
  block that keeps the DP matrix in VMEM and does forward DP + backtrack
  without touching HBM per row.

DP recurrence (equivalent to core.pyx:15-28): a path must consume exactly one
frame per step and may advance the text position by 0 or 1, so

    value[y, x] = neg_cent[y, x] + max(value[y-1, x] if x < y else -inf,
                                       value[y-1, x-1] if x > 0 else (0 if y == 0 else -inf))

and the backtrack walks from (t_y-1, t_x-1) choosing the larger predecessor
(core.pyx:30-33). Variable lengths are handled with masks; the path for item
b lives in [0, t_y_b) x [0, t_x_b).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_NEG = -1e9


def _forward_dp(neg_cent: jax.Array, t_xs: jax.Array) -> jax.Array:
    """Run the row-wise DP. neg_cent: [B, T_y, T_x] -> value: [B, T_y, T_x]."""
    B, T_y, T_x = neg_cent.shape
    xs_idx = jnp.arange(T_x)
    x_valid = xs_idx[None, :] < t_xs[:, None]  # [B, T_x]

    # row 0: only x == 0 is reachable
    row0 = jnp.where(
        (xs_idx[None, :] == 0) & x_valid, neg_cent[:, 0, :], MAX_NEG
    )

    def step(prev_row, inp):
        y, nc_row = inp
        # stay: value[y-1, x], only legal when x < y (x == y must have advanced)
        v_stay = jnp.where(xs_idx[None, :] == y, MAX_NEG, prev_row)
        # advance: value[y-1, x-1]
        v_adv = jnp.pad(
            prev_row, ((0, 0), (1, 0)), constant_values=MAX_NEG
        )[:, :-1]
        row = nc_row + jnp.maximum(v_stay, v_adv)
        row = jnp.where(x_valid, row, MAX_NEG)
        row = jnp.maximum(row, MAX_NEG)  # keep -inf accumulation bounded
        return row, row

    ys = jnp.arange(1, T_y)
    _, rows = jax.lax.scan(step, row0, (ys, jnp.swapaxes(neg_cent, 0, 1)[1:]))
    value = jnp.concatenate([row0[:, None, :], jnp.swapaxes(rows, 0, 1)], axis=1)
    return value


def _backtrack(value: jax.Array, t_ys: jax.Array, t_xs: jax.Array) -> jax.Array:
    """Walk the DP matrix backwards emitting one-hot text positions per frame."""
    B, T_y, T_x = value.shape
    xs_idx = jnp.arange(T_x)

    def step(index, inp):
        y, val_row_prev = inp  # val_row_prev = value[y-1] (row of zeros for y=0)
        active = y < t_ys  # [B]
        path_row = (
            (xs_idx[None, :] == index[:, None]) & active[:, None]
        ).astype(jnp.float32)
        v_here = jnp.take_along_axis(val_row_prev, index[:, None], axis=1)[:, 0]
        v_left = jnp.take_along_axis(
            val_row_prev, jnp.maximum(index - 1, 0)[:, None], axis=1
        )[:, 0]
        move = (index == y) | (v_here < v_left)
        index = jnp.where(active & (index > 0) & move, index - 1, index)
        return index, path_row

    init_index = jnp.maximum(t_xs - 1, 0)
    ys = jnp.arange(T_y - 1, -1, -1)
    prev_rows = jnp.concatenate(
        [jnp.zeros((B, 1, T_x), value.dtype), value[:, :-1]], axis=1
    )  # prev_rows[y] = value[y-1]
    _, rows = jax.lax.scan(
        step, init_index, (ys, jnp.swapaxes(prev_rows, 0, 1)[::-1])
    )
    path = jnp.swapaxes(rows, 0, 1)[:, ::-1]  # un-reverse the y axis
    return path


def maximum_path_scan(
    neg_cent: jax.Array, t_ys: jax.Array, t_xs: jax.Array
) -> jax.Array:
    """MAS via lax.scan. neg_cent: [B, T_y, T_x] log-likes; returns {0,1} path."""
    value = _forward_dp(neg_cent, t_xs)
    return _backtrack(value, t_ys, t_xs)


def maximum_path(
    neg_cent: jax.Array, mask: jax.Array, use_pallas: bool | None = None
) -> jax.Array:
    """Drop-in equivalent of monotonic_align.maximum_path(neg_cent, mask).

    neg_cent: [B, T_y, T_x]; mask: [B, T_y, T_x] in {0,1}
    (mask[b, y, x] = y < t_y_b and x < t_x_b).
    Dispatches to the Pallas kernel on TPU, lax.scan elsewhere.
    """
    t_ys = jnp.sum(mask[:, :, 0].astype(jnp.int32), axis=1)
    t_xs = jnp.sum(mask[:, 0, :].astype(jnp.int32), axis=1)
    # the DP accumulates along T_y; run it in fp32 even under bf16 training
    neg_cent = jnp.where(mask > 0, neg_cent.astype(jnp.float32), MAX_NEG)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from torch_tts_tpu.kernels.mas_pallas import maximum_path_pallas

        path = maximum_path_pallas(neg_cent, t_ys, t_xs)
    else:
        path = maximum_path_scan(neg_cent, t_ys, t_xs)
    return path * mask.astype(path.dtype)
