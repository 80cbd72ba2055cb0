"""Multi-band iSTFT decoder (ops/mb_istft.py, arXiv:2210.15975 variant):

- PQMF analysis->synthesis round trip reconstructs the signal (near-perfect
  reconstruction property of the cosine-modulated bank),
- the WOLA inverse_stft inverts a real STFT (scipy oracle),
- the generator produces the exact hop-consistent sample count, is finite,
  and propagates gradients to every parameter,
- the full VITS2 train step runs with `decoder_type: mb_istft`.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_tts_tpu.ops.mb_istft import (
    MultiBandISTFTGenerator,
    PQMF,
    inverse_stft,
    overlap_add,
)


def test_pqmf_reconstruction(rng):
    pqmf = PQMF(subbands=4)
    L = 4096
    x = jnp.asarray(
        (rng.standard_normal((2, L, 1)) * 0.3).astype(np.float32)
    )
    sub = pqmf.analysis(x)
    assert sub.shape == (2, L // 4, 4)
    y = pqmf.synthesis(sub)
    assert y.shape == x.shape

    # the group-delay trim makes the cascade delay-free; demand high SNR
    # away from the boundary transients
    xr = np.asarray(x)[0, 200:-200, 0]
    yr = np.asarray(y)[0, 200:-200, 0]
    snr = 10 * np.log10(np.sum(xr**2) / (np.sum((xr - yr) ** 2) + 1e-12))
    assert snr > 40.0, f"PQMF reconstruction SNR {snr:.1f} dB"


def test_overlap_add_matches_loop(rng):
    frames = jnp.asarray(rng.standard_normal((1, 5, 8)).astype(np.float32))
    hop = 3
    y = np.asarray(overlap_add(frames, hop))[0]
    ref = np.zeros(4 * hop + 8, np.float32)
    f = np.asarray(frames)[0]
    for t in range(5):
        ref[t * hop : t * hop + 8] += f[t]
    np.testing.assert_allclose(y, ref, atol=1e-6)


def test_inverse_stft_against_scipy(rng):
    from scipy.signal import stft as sp_stft

    n_fft, hop = 16, 4
    L = 256
    x = (rng.standard_normal(L) * 0.3).astype(np.float32)
    # scipy STFT with hann, centered (matches torch.stft center=True);
    # scaling="spectrum" divides frames by win.sum() — undo it to get the
    # raw windowed DFT frames our inverse expects
    win = np.hanning(n_fft + 1)[:-1]
    _, _, Zr = sp_stft(x, nperseg=n_fft, noverlap=n_fft - hop, window=win,
                       boundary="zeros", padded=True, return_onesided=True,
                       scaling="spectrum")
    Z = (Zr.T * win.sum()).astype(np.complex64)

    mag = jnp.asarray(np.abs(Z))[None]
    phase = jnp.asarray(np.angle(Z).astype(np.float32))[None]
    y = np.asarray(inverse_stft(mag, phase, n_fft, hop))[0]
    # WOLA of a consistent STFT reconstructs the signal exactly away from the
    # zero-padded tail
    n = min(len(y), L)
    np.testing.assert_allclose(y[: n - n_fft], x[: n - n_fft], atol=1e-3)


def test_generator_shapes_and_grads(rng):
    gen = MultiBandISTFTGenerator(
        resblock="2", resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
        upsample_initial_channel=32, subbands=4, istft_n_fft=16, istft_hop=4,
    )
    B, T, C = 2, 10, 16
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), x)["params"]
    y = gen.apply({"params": params}, x)
    # total upsampling = 2*2 (convs) * 4 (istft hop) * 4 (subbands) = 64
    assert y.shape == (B, T * 64, 1)
    assert np.isfinite(np.asarray(y)).all()

    def loss(p):
        return jnp.sum(gen.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves_with_path(g)
    dead = [jax.tree_util.keystr(k) for k, v in flat
            if not np.isfinite(np.asarray(v)).all()
            or np.abs(np.asarray(v)).max() == 0]
    assert not dead, f"zero/non-finite grads: {dead[:5]}"


def test_train_step_mb_istft(rng):
    """The full GAN train step with the lightweight decoder: hop consistency
    with the data pipeline (wav slices vs decoded segments) and finite
    losses."""
    from test_vits2_train_step import build_all, tiny_config

    cfg = tiny_config()
    # tiny hop is 64 = 2*2 (convs) * 4 (istft) * 4 (subbands)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, decoder_type="mb_istft",
            upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
            subbands=4, gen_istft_n_fft=16, gen_istft_hop_size=4,
        ),
    )
    model, mpd, dd, batch, state, step_fn = build_all(cfg, rng)
    new_state, metrics = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(0))
    for k in ("loss/g/total", "loss/d/total", "loss/g/mel"):
        assert np.isfinite(float(metrics[k])), k
    a = jax.tree.leaves(state.params_g)[0]
    b = jax.tree.leaves(new_state.params_g)[0]
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 0
