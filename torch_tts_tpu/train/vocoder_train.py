"""Standalone mel->waveform HiFi-GAN vocoder training.

The reference has no vocoder trainer — its tacotron inference loads an
externally-trained TorchScript vocoder (/root/reference/tacotron/
inference.py:84-86) whose provenance is out of tree. This closes the loop
natively: train ops/hifigan.py's Generator to invert the tacotron audio
frontend's mel (audio/frontend.py AudioFrontend + m_fwd network domain,
affine-renormed with the same constants the reference's handoff uses), with
the standard HiFi-GAN recipe — MPD adversarial + feature-matching + L1 mel
(the same losses the VITS2 step uses, models/vits2/losses.py) — or a
recon-only mode (L1 mel + L1 wave) for fast bootstrap/tests.

The resulting artifact (infer/vocoder.py save_vocoder) is what
``cli/tacotron_infer.py --vocoder`` consumes.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from torch_tts_tpu.audio.frontend import AudioFrontend, amplitude_to_db, m_fwd
from torch_tts_tpu.models.vits2.losses import (
    discriminator_loss,
    feature_loss,
    generator_loss,
)


class VocoderTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params_g: Any
    opt_g: Any
    params_d: Any = None
    opt_d: Any = None


def make_mel_fn(fe: AudioFrontend) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """wav [B, L] -> mel_net [B, T, M] with the tacotron frontend's exact
    operator chain (window-normalized power STFT, dB, m_fwd). Differentiable,
    so it doubles as the training mel loss target map."""
    fb = fe._mel_fb

    def mel_fn(wav):
        D = fe._stft_power(wav)  # [B, T, F]
        M = jnp.einsum("btf,mf->btm", D, fb)
        return m_fwd(amplitude_to_db(M))

    return mel_fn


def make_vocoder_train_step(
    gen,
    mel_fn: Callable[[jnp.ndarray], jnp.ndarray],
    tx_g: optax.GradientTransformation,
    *,
    mpd=None,
    tx_d: Optional[optax.GradientTransformation] = None,
    mel_shift: float,
    mel_scale: float,
    c_mel: float = 45.0,
    c_wav: float = 0.0,
):
    """Jittable (state, batch) -> (state, metrics).

    batch: {"wav": [B, L] target segments, "mel": [B, T, M] net-domain mels
    of those segments, T * hop == L}. With ``mpd`` set this is the HiFi-GAN
    GAN step (D step, then G through the updated D — same ordering contract
    as vits2_train.py); without it, recon-only (c_mel mel L1 + c_wav wav L1).
    """
    use_gan = mpd is not None
    if use_gan and tx_d is None:
        raise ValueError("GAN training needs tx_d")

    def step(state: VocoderTrainState, batch: Dict[str, jnp.ndarray]):
        wav, mel = batch["wav"], batch["mel"]
        mel_log = (mel - mel_shift) / mel_scale
        y = wav[..., None]  # [B, L, 1]

        def g_fwd(params_g):
            return gen.apply({"params": params_g}, mel_log)  # [B, L, 1]

        params_d, opt_d = state.params_d, state.opt_d
        metrics: Dict[str, jnp.ndarray] = {}

        if use_gan:
            y_hat_sg = jax.lax.stop_gradient(g_fwd(state.params_g))

            def d_loss_fn(params_d):
                y_d_r, y_d_g, _, _ = mpd.apply({"params": params_d}, y, y_hat_sg)
                loss_disc, _, _ = discriminator_loss(y_d_r, y_d_g)
                return loss_disc

            loss_disc, grads_d = jax.value_and_grad(d_loss_fn)(params_d)
            upd_d, opt_d = tx_d.update(grads_d, state.opt_d, params_d)
            params_d = optax.apply_updates(params_d, upd_d)
            metrics["loss/d/total"] = loss_disc

        def g_loss_fn(params_g):
            y_hat = g_fwd(params_g)
            # center=True framing yields T+1 frames for T*hop samples; frame
            # j of the segment is centered where full-utterance frame t0+j
            # is, so trim to the target's T frames
            mel_hat = mel_fn(y_hat[..., 0])[:, : mel.shape[1]]
            loss_mel = c_mel * jnp.mean(jnp.abs(mel_hat - mel))
            loss = loss_mel
            aux = {"loss/g/mel": loss_mel}
            if c_wav:
                loss_wav = c_wav * jnp.mean(jnp.abs(y_hat - y))
                loss = loss + loss_wav
                aux["loss/g/wav"] = loss_wav
            if use_gan:
                _, y_d_g, fmap_r, fmap_g = mpd.apply({"params": params_d}, y, y_hat)
                loss_fm = feature_loss(fmap_r, fmap_g)
                loss_gen, _ = generator_loss(y_d_g)
                loss = loss + loss_fm + loss_gen
                aux["loss/g/fm"] = loss_fm
                aux["loss/g/gen"] = loss_gen
            aux["loss/g/total"] = loss
            return loss, aux

        (loss_g, aux), grads_g = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.params_g
        )
        upd_g, opt_g = tx_g.update(grads_g, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, upd_g)
        metrics.update(aux)

        return (
            state.replace(
                step=state.step + 1,
                params_g=params_g,
                opt_g=opt_g,
                params_d=params_d,
                opt_d=opt_d,
            ),
            metrics,
        )

    return step


def create_vocoder_state(
    gen,
    tx_g: optax.GradientTransformation,
    num_mels: int,
    *,
    mpd=None,
    tx_d: Optional[optax.GradientTransformation] = None,
    seed: int = 0,
    seg_frames: int = 32,
    hop: int = 256,
) -> VocoderTrainState:
    k = jax.random.PRNGKey(seed)
    mel0 = jnp.zeros((1, seg_frames, num_mels), jnp.float32)
    params_g = gen.init({"params": k}, mel0)["params"]
    params_d = opt_d = None
    if mpd is not None:
        y0 = jnp.zeros((1, seg_frames * hop, 1), jnp.float32)
        params_d = mpd.init({"params": jax.random.fold_in(k, 1)}, y0, y0)["params"]
        opt_d = tx_d.init(params_d)
    return VocoderTrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g,
        opt_g=tx_g.init(params_g),
        params_d=params_d,
        opt_d=opt_d,
    )
