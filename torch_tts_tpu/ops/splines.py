"""Piecewise rational-quadratic spline transforms (normalizing-flow bijector).

Equivalent of /root/reference/vits2/transforms.py:12-209 (the Durkan et al.
neural-spline-flow construction with linear tails), rewritten for XLA:
- the reference scatters through boolean masks
  (`outputs[inside_interval_mask] = ...`), which is not expressible under jit;
  here everything is computed densely and combined with `jnp.where`,
- bin lookup is a comparison+sum "searchsorted" and bin-parameter selection is
  `take_along_axis` gathers,
- inputs are clamped into the domain before the spline math so the outside-
  interval lanes never produce NaNs that could poison gradients through
  `where`.

Shapes: inputs [..., C]-free — the function is elementwise over inputs with a
trailing bins axis on the parameter tensors: inputs [...], params [..., K].
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def _searchsorted(bin_locations, inputs, eps=1e-6):
    # bump the top edge so inputs == right land in the last bin
    bin_locations = bin_locations.at[..., -1].add(eps)
    return jnp.sum((inputs[..., None] >= bin_locations).astype(jnp.int32), axis=-1) - 1


def _gather(params, idx):
    return jnp.take_along_axis(params, idx[..., None], axis=-1)[..., 0]


def rational_quadratic_spline(
    inputs,
    unnormalized_widths,
    unnormalized_heights,
    unnormalized_derivatives,
    inverse: bool = False,
    left: float = 0.0,
    right: float = 1.0,
    bottom: float = 0.0,
    top: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[jax.Array, jax.Array]:
    """Monotonic RQ spline on [left,right] -> [bottom,top].

    unnormalized_derivatives has K+1 entries (interior knots + both edges).
    Returns (outputs, logabsdet) with logabsdet of the forward map (the caller
    negates for inverse, matching the reference's convention).
    """
    num_bins = unnormalized_widths.shape[-1]

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (right - left) * cumwidths + left
    cumwidths = cumwidths.at[..., 0].set(left)
    cumwidths = cumwidths.at[..., -1].set(right)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights, [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (top - bottom) * cumheights + bottom
    cumheights = cumheights.at[..., 0].set(bottom)
    cumheights = cumheights.at[..., -1].set(top)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    if inverse:
        bin_idx = _searchsorted(cumheights, inputs)
    else:
        bin_idx = _searchsorted(cumwidths, inputs)
    bin_idx = jnp.clip(bin_idx, 0, num_bins - 1)

    in_cumwidths = _gather(cumwidths, bin_idx)
    in_bin_widths = _gather(widths, bin_idx)
    in_cumheights = _gather(cumheights, bin_idx)
    delta = heights / widths
    in_delta = _gather(delta, bin_idx)
    in_derivatives = _gather(derivatives, bin_idx)
    in_derivatives_p1 = _gather(derivatives[..., 1:], bin_idx)
    in_heights = _gather(heights, bin_idx)

    if inverse:
        a = (inputs - in_cumheights) * (
            in_derivatives + in_derivatives_p1 - 2 * in_delta
        ) + in_heights * (in_delta - in_derivatives)
        b = in_heights * in_derivatives - (inputs - in_cumheights) * (
            in_derivatives + in_derivatives_p1 - 2 * in_delta
        )
        c = -in_delta * (inputs - in_cumheights)
        discriminant = b**2 - 4 * a * c
        discriminant = jnp.maximum(discriminant, 0.0)
        root = (2 * c) / (-b - jnp.sqrt(discriminant))
        outputs = root * in_bin_widths + in_cumwidths
        theta_1mt = root * (1 - root)
        denominator = in_delta + (
            (in_derivatives + in_derivatives_p1 - 2 * in_delta) * theta_1mt
        )
        dnum = in_delta**2 * (
            in_derivatives_p1 * root**2
            + 2 * in_delta * theta_1mt
            + in_derivatives * (1 - root) ** 2
        )
        logabsdet = jnp.log(dnum) - 2 * jnp.log(denominator)
        return outputs, -logabsdet
    else:
        theta = (inputs - in_cumwidths) / in_bin_widths
        theta_1mt = theta * (1 - theta)
        numerator = in_heights * (in_delta * theta**2 + in_derivatives * theta_1mt)
        denominator = in_delta + (
            (in_derivatives + in_derivatives_p1 - 2 * in_delta) * theta_1mt
        )
        outputs = in_cumheights + numerator / denominator
        dnum = in_delta**2 * (
            in_derivatives_p1 * theta**2
            + 2 * in_delta * theta_1mt
            + in_derivatives * (1 - theta) ** 2
        )
        logabsdet = jnp.log(dnum) - 2 * jnp.log(denominator)
        return outputs, logabsdet


def piecewise_rational_quadratic_transform(
    inputs,
    unnormalized_widths,
    unnormalized_heights,
    unnormalized_derivatives,
    inverse: bool = False,
    tails: str | None = "linear",
    tail_bound: float = 5.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[jax.Array, jax.Array]:
    """Unconstrained spline: identity outside [-tail_bound, tail_bound].

    unnormalized_derivatives has K-1 entries (interior knots only); the edge
    derivatives are pinned so the spline meets the linear tails with slope 1.
    """
    if tails is None:
        return rational_quadratic_spline(
            inputs,
            unnormalized_widths,
            unnormalized_heights,
            unnormalized_derivatives,
            inverse=inverse,
            min_bin_width=min_bin_width,
            min_bin_height=min_bin_height,
            min_derivative=min_derivative,
        )
    if tails != "linear":
        raise NotImplementedError(f"{tails} tails are not implemented")

    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)

    # pin edge derivatives: softplus(c) == 1 - min_derivative
    constant = math.log(math.expm1(1 - min_derivative))
    pad_cfg = [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)]
    ud = jnp.pad(unnormalized_derivatives, pad_cfg, constant_values=constant)

    clamped = jnp.clip(inputs, -tail_bound, tail_bound)
    out_in, lad_in = rational_quadratic_spline(
        clamped,
        unnormalized_widths,
        unnormalized_heights,
        ud,
        inverse=inverse,
        left=-tail_bound,
        right=tail_bound,
        bottom=-tail_bound,
        top=tail_bound,
        min_bin_width=min_bin_width,
        min_bin_height=min_bin_height,
        min_derivative=min_derivative,
    )
    outputs = jnp.where(inside, out_in, inputs)
    logabsdet = jnp.where(inside, lad_in, 0.0)
    return outputs, logabsdet
