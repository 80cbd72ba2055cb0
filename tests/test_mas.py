"""MAS correctness: naive numpy DP (direct transcription of the recurrence)
vs lax.scan implementation vs Pallas kernel (interpret mode on CPU).
Dual-implementation parity is the reference repo's own verification idiom
(tools/alignment.py:156-172)."""

import numpy as np
import pytest

import jax.numpy as jnp

from torch_tts_tpu.kernels import mas


def naive_mas(neg_cent, t_y, t_x):
    """Scalar-loop Viterbi DP, the oracle. neg_cent: [T_y, T_x]."""
    NEG = -1e9
    value = np.full((t_y, t_x), NEG, dtype=np.float64)
    for y in range(t_y):
        for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
            v_cur = NEG if x == y else value[y - 1, x]
            if x == 0:
                v_prev = 0.0 if y == 0 else NEG
            else:
                v_prev = value[y - 1, x - 1]
            value[y, x] = neg_cent[y, x] + max(v_prev, v_cur)
    path = np.zeros((t_y, t_x), dtype=np.float32)
    index = t_x - 1
    for y in range(t_y - 1, -1, -1):
        path[y, index] = 1
        if index != 0 and (index == y or value[y - 1, index] < value[y - 1, index - 1]):
            index -= 1
    return path


def make_batch(rng, B, T_y, T_x, ragged=True):
    neg_cent = rng.standard_normal((B, T_y, T_x)).astype(np.float32)
    if ragged:
        t_ys = rng.integers(T_x, T_y + 1, size=B)  # t_y >= t_x for feasibility
        t_xs = rng.integers(2, T_x + 1, size=B)
        t_ys = np.maximum(t_ys, t_xs)
    else:
        t_ys = np.full(B, T_y)
        t_xs = np.full(B, T_x)
    mask = (np.arange(T_y)[None, :, None] < t_ys[:, None, None]) & (
        np.arange(T_x)[None, None, :] < t_xs[:, None, None]
    )
    return neg_cent, t_ys, t_xs, mask.astype(np.float32)


def check_path_valid(path, t_y, t_x):
    """Structural invariants: one token per frame, monotonic, full coverage."""
    p = path[:t_y, :t_x]
    assert np.all(p.sum(axis=1) == 1)
    pos = p.argmax(axis=1)
    d = np.diff(pos)
    assert np.all((d == 0) | (d == 1))
    assert pos[0] == 0 and pos[-1] == t_x - 1


@pytest.mark.parametrize("shape", [(3, 20, 7), (2, 57, 31), (4, 100, 100)])
def test_scan_matches_naive(rng, shape):
    B, T_y, T_x = shape
    neg_cent, t_ys, t_xs, mask = make_batch(rng, B, T_y, T_x)
    got = np.asarray(
        mas.maximum_path(jnp.asarray(neg_cent), jnp.asarray(mask), use_pallas=False)
    )
    for b in range(B):
        want = naive_mas(neg_cent[b].astype(np.float64), t_ys[b], t_xs[b])
        check_path_valid(got[b], t_ys[b], t_xs[b])
        np.testing.assert_array_equal(got[b, : t_ys[b], : t_xs[b]], want)
        # nothing outside the valid region
        assert got[b].sum() == want.sum()


def test_pallas_interpret_matches_scan(rng):
    from torch_tts_tpu.kernels.mas_pallas import maximum_path_pallas

    B, T_y, T_x = 3, 64, 24
    neg_cent, t_ys, t_xs, mask = make_batch(rng, B, T_y, T_x)
    nc_masked = np.where(mask > 0, neg_cent, mas.MAX_NEG).astype(np.float32)
    got_pl = np.asarray(
        maximum_path_pallas(
            jnp.asarray(nc_masked),
            jnp.asarray(t_ys),
            jnp.asarray(t_xs),
            interpret=True,
        )
    ) * mask
    got_scan = np.asarray(
        mas.maximum_path(jnp.asarray(neg_cent), jnp.asarray(mask), use_pallas=False)
    )
    np.testing.assert_array_equal(got_pl, got_scan)


def test_degenerate_single_token(rng):
    # t_x = 1: every frame maps to token 0
    B, T_y, T_x = 2, 11, 4
    neg_cent = rng.standard_normal((B, T_y, T_x)).astype(np.float32)
    t_ys, t_xs = np.array([11, 5]), np.array([1, 1])
    mask = (np.arange(T_y)[None, :, None] < t_ys[:, None, None]) & (
        np.arange(T_x)[None, None, :] < t_xs[:, None, None]
    )
    got = np.asarray(
        mas.maximum_path(
            jnp.asarray(neg_cent), jnp.asarray(mask.astype(np.float32)),
            use_pallas=False,
        )
    )
    assert got[0, :, 0].sum() == 11
    assert got[1, :5, 0].sum() == 5
    assert got.sum() == 16
