"""Fused MRF resblock-bank kernel (kernels/mrf_fused.py).

Chain of evidence: (1) the Pallas kernel (interpret mode) matches the
plain-jnp oracle `mrf_ref` across multi-window grids and boundary
positions; (2) Generator(fuse_mrf=True) — which dispatches to `mrf_ref`
off-TPU — matches the unfused Generator exactly, with an identical
parameter tree. Together these pin the compiled TPU path to the unfused
module up to fp32 accumulation order (spot-checked on chip in
scripts/bench_infer_breakdown.py --fuse-mrf).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_tts_tpu.kernels.mrf_fused import (
    dilated_offsets,
    mrf_fused,
    mrf_ref,
)


def _rand_blocks(rng, C, kernel_sizes=(3, 7), dil=(1, 3, 5)):
    blocks = []
    for k in kernel_sizes:
        iters = []
        for d in dil:
            iters.append((
                (dilated_offsets(k, d),
                 jnp.asarray(rng.normal(size=(k * C, C)) * 0.1, jnp.float32),
                 jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)),
                (dilated_offsets(k, 1),
                 jnp.asarray(rng.normal(size=(k * C, C)) * 0.1, jnp.float32),
                 jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)),
            ))
        blocks.append(tuple(iters))
    return tuple(blocks)


@pytest.mark.parametrize("T,tile", [(48, 16), (50, 16), (16, 64)])
def test_kernel_matches_ref_multiwindow(T, tile):
    """Multi-window grids, T % tile != 0, and T < halo all agree with the
    oracle — boundary (validity-mask) semantics included."""
    rng = np.random.default_rng(0)
    C = 128
    blocks = _rand_blocks(rng, C)
    x = jnp.asarray(rng.normal(size=(2, T, C)), jnp.float32)
    ref = mrf_ref(x, blocks)
    out = mrf_fused(x, blocks, tile=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ref_matches_unfused_resblocks():
    """mrf_ref with collected kernels == the actual ResBlock1 bank math."""
    from torch_tts_tpu.ops.hifigan import ResBlock1

    rng = np.random.default_rng(1)
    C, T = 32, 64
    x = jnp.asarray(rng.normal(size=(1, T, C)), jnp.float32)
    kernel_sizes, dil = (3, 5), (1, 3)
    params, blocks, outs = [], [], []
    for j, k in enumerate(kernel_sizes):
        block = ResBlock1(C, k, dil)
        p = block.init(jax.random.PRNGKey(j), x)
        outs.append(block.apply(p, x))
        blocks.append(block.apply(p, x, return_kernels=True))
    ref_bank = sum(outs) / len(outs)
    out = mrf_ref(x, tuple(blocks))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_bank),
                               rtol=1e-5, atol=1e-5)


def test_generator_fuse_mrf_equivalence():
    """Full Generator with fuse_mrf on/off: identical params, equal output
    (off-TPU the fused path runs mrf_ref — the same contract the Pallas
    kernel is pinned to above)."""
    from torch_tts_tpu.ops.hifigan import Generator

    kw = dict(
        resblock="1",
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        upsample_rates=(8, 2),
        upsample_initial_channel=128,
        upsample_kernel_sizes=(16, 4),
    )
    fp = Generator(**kw)
    fu = Generator(**kw, fuse_mrf=True)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 24, 48)),
                    jnp.float32)
    params = fp.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(params) == jax.tree.structure(
        fu.init(jax.random.PRNGKey(0), x)
    )
    y0 = fp.apply(params, x)
    y1 = fu.apply(params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-6)


def test_generator_fuse_mrf_respects_mask_gate():
    """With a mask the fused path must NOT engage (it has no mask support);
    outputs still equal the unfused masked decode."""
    from torch_tts_tpu.ops.hifigan import Generator

    kw = dict(
        resblock="1",
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        upsample_rates=(4,),
        upsample_initial_channel=64,
        upsample_kernel_sizes=(8,),
    )
    fp = Generator(**kw)
    fu = Generator(**kw, fuse_mrf=True)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 16, 32)), jnp.float32)
    mask = jnp.asarray(
        (np.arange(16) < 12).astype(np.float32)[None, :, None])
    params = fp.init(jax.random.PRNGKey(0), x)
    y0 = fp.apply(params, x, x_mask=mask)
    y1 = fu.apply(params, x, x_mask=mask)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-6, atol=1e-6)
