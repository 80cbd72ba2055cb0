"""Full-model numerical parity against the actual PyTorch reference.

BASELINE.md mandates "run the PyTorch reference on the same inputs as the
parity oracle". Here the reference implementation itself
(/root/reference/vits2, imported read-only with its unused Cython
monotonic_align stubbed) is loaded with OUR parameters via the checkpoint
converter, and deterministic paths are compared end-to-end:

- `load_state_dict(strict=True)` proves the converter emits exactly the
  reference's parameter names/shapes,
- TextEncoder forward parity,
- full `infer` parity (use_sdp=False so durations are deterministic,
  noise_scale=0 so z_p == m_p): identical durations, alignment, and waveform.
"""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from torch_tts_tpu.core.config import VITS2ModelConfig
from torch_tts_tpu.models.vits2 import SynthesizerTrn
from torch_tts_tpu.models.vits2.convert import export_torch_state_dict

REF = "/root/reference/vits2"


@pytest.fixture(scope="module")
def ref_models():
    """Import the reference's models.py (torch-only; MAS stubbed)."""
    if "monotonic_align" not in sys.modules:
        stub = types.ModuleType("monotonic_align")
        stub.maximum_path = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("MAS stub: training path not under test")
        )
        sys.modules["monotonic_align"] = stub
    sys.path.insert(0, REF)
    import models as ref_models_mod  # noqa: F401

    yield ref_models_mod
    sys.path.remove(REF)


CFG = VITS2ModelConfig(
    inter_channels=8,
    hidden_channels=8,
    filter_channels=16,
    n_heads=2,
    n_layers=2,
    kernel_size=3,
    p_dropout=0.0,
    resblock="1",
    resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),  # ResBlock1 needs 3 dils
    upsample_rates=(4, 2),
    upsample_initial_channel=16,
    upsample_kernel_sizes=(8, 4),
    use_sdp=False,  # deterministic durations for the parity run
    use_transformer_flows=True,
    transformer_flow_type="pre_conv",
    segment_size=8 * 8,
)
N_VOCAB, SPEC_CH = 20, 12


def build_pair(ref_models, cfg=CFG):
    ours = SynthesizerTrn(n_vocab=N_VOCAB, spec_channels=SPEC_CH,
                          segment_frames=4, cfg=cfg)
    x = jnp.asarray([[1, 2, 3, 4, 5, 6, 7]])
    xl = jnp.asarray([7])
    y = jnp.zeros((1, 16, SPEC_CH))
    yl = jnp.asarray([16])
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    params = ours.init(rngs, x, xl, y, yl)["params"]
    params = jax.device_get(params)

    sd = export_torch_state_dict(params, cfg)
    sd_t = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}

    ref = ref_models.SynthesizerTrn(
        N_VOCAB,
        SPEC_CH,
        4,
        inter_channels=cfg.inter_channels,
        hidden_channels=cfg.hidden_channels,
        filter_channels=cfg.filter_channels,
        n_heads=cfg.n_heads,
        n_layers=cfg.n_layers,
        kernel_size=cfg.kernel_size,
        p_dropout=cfg.p_dropout,
        resblock=cfg.resblock,
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in cfg.resblock_dilation_sizes],
        upsample_rates=list(cfg.upsample_rates),
        upsample_initial_channel=cfg.upsample_initial_channel,
        upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
        n_speakers=cfg.n_speakers,
        gin_channels=cfg.gin_channels,
        use_sdp=cfg.use_sdp,
        use_transformer_flows=cfg.use_transformer_flows,
        transformer_flow_type=cfg.transformer_flow_type,
    )
    missing, unexpected = ref.load_state_dict(sd_t, strict=False)
    # strict check done manually for a clearer error message
    assert not missing, f"converter missing keys for reference: {missing[:8]}"
    assert not unexpected, f"converter emitted unknown keys: {unexpected[:8]}"
    ref.eval()
    return ours, params, ref


def test_converter_covers_reference_exactly(ref_models):
    build_pair(ref_models)


def test_text_encoder_forward_parity(ref_models, rng):
    ours, params, ref = build_pair(ref_models)
    ids = rng.integers(1, N_VOCAB, 7)
    x = jnp.asarray(ids[None])
    xl = jnp.asarray([7])

    hx, m_p, logs_p, x_mask = ours.apply(
        {"params": params}, x, xl, deterministic=True,
        method=lambda m, x, xl, deterministic: m.enc_p(
            x, xl, deterministic=deterministic
        ),
    )
    with torch.no_grad():
        hx_t, m_t, logs_t, mask_t = ref.enc_p(
            torch.from_numpy(ids[None].astype(np.int64)), torch.tensor([7])
        )
    # reference layout [B, C, T] -> ours [B, T, C]
    np.testing.assert_allclose(
        np.asarray(hx), hx_t.numpy().transpose(0, 2, 1), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(m_p), m_t.numpy().transpose(0, 2, 1), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(logs_p), logs_t.numpy().transpose(0, 2, 1), rtol=1e-4, atol=1e-5
    )


def test_full_infer_parity(ref_models, rng):
    """Waveform-level parity on the deterministic inference path."""
    ours, params, ref = build_pair(ref_models)
    ids = rng.integers(1, N_VOCAB, 7)
    x = jnp.asarray(ids[None])
    xl = jnp.asarray([7])
    MAX_F = 32

    audio, attn, y_mask, aux, y_lengths = ours.apply(
        {"params": params}, x, xl,
        noise_scale=0.0, noise_scale_w=0.0, length_scale=1.0, max_frames=MAX_F,
        method=SynthesizerTrn.infer,
        rngs={"noise": jax.random.PRNGKey(0)},
    )
    n_frames = int(np.asarray(y_lengths)[0])

    with torch.no_grad():
        o_t, attn_t, mask_t, _ = ref.infer(
            torch.from_numpy(ids[None].astype(np.int64)), torch.tensor([7]),
            noise_scale=0.0, length_scale=1.0, noise_scale_w=0.0,
        )
    ref_frames = int(mask_t.sum())
    assert n_frames == ref_frames, "deterministic durations must agree"
    assert n_frames > 0

    # alignment parity (ours [B, T_y, T_x]; reference [B, 1, T_y, T_x])
    np.testing.assert_array_equal(
        np.asarray(attn)[0, :n_frames], attn_t[0, 0, :n_frames].numpy()
    )

    hop = 8  # prod(upsample_rates)
    ours_wav = np.asarray(audio)[0, : n_frames * hop, 0]
    ref_wav = o_t[0, 0, : n_frames * hop].numpy()
    np.testing.assert_allclose(ours_wav, ref_wav, rtol=1e-3, atol=2e-4)
    assert np.abs(ours_wav - ref_wav).mean() < 1e-4


def test_full_infer_parity_plain_flows(ref_models, rng):
    """Same check on the VITS1 configuration (plain couplings)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, use_transformer_flows=False)
    ours, params, ref = build_pair(ref_models, cfg)
    ids = rng.integers(1, N_VOCAB, 6)
    x = jnp.asarray(ids[None])
    xl = jnp.asarray([6])

    audio, attn, y_mask, aux, y_lengths = ours.apply(
        {"params": params}, x, xl,
        noise_scale=0.0, noise_scale_w=0.0, length_scale=1.0, max_frames=32,
        method=SynthesizerTrn.infer,
        rngs={"noise": jax.random.PRNGKey(0)},
    )
    n_frames = int(np.asarray(y_lengths)[0])
    with torch.no_grad():
        o_t, attn_t, mask_t, _ = ref.infer(
            torch.from_numpy(ids[None].astype(np.int64)), torch.tensor([6]),
            noise_scale=0.0, length_scale=1.0, noise_scale_w=0.0,
        )
    assert n_frames == int(mask_t.sum())
    ours_wav = np.asarray(audio)[0, : n_frames * 8, 0]
    ref_wav = o_t[0, 0, : n_frames * 8].numpy()
    np.testing.assert_allclose(ours_wav, ref_wav, rtol=1e-3, atol=2e-4)


def test_discriminator_parity(ref_models, rng):
    """MultiPeriodDiscriminator logits + feature maps match the reference."""
    import torch as T

    from torch_tts_tpu.models.vits2 import MultiPeriodDiscriminator
    from torch_tts_tpu.models.vits2.convert import (
        convert_mpd,
        export_mpd_torch_state_dict,
    )

    B, L = 2, 441  # odd length exercises the period reflect-padding
    y = rng.standard_normal((B, L, 1)).astype(np.float32)
    y_hat = rng.standard_normal((B, L, 1)).astype(np.float32)

    mpd = MultiPeriodDiscriminator()
    variables = mpd.init(jax.random.PRNGKey(0), jnp.asarray(y), jnp.asarray(y_hat))
    params = jax.device_get(variables["params"])

    sd = export_mpd_torch_state_dict(params)
    ref_d = ref_models.MultiPeriodDiscriminator(use_spectral_norm=False)
    missing, unexpected = ref_d.load_state_dict(
        {k: T.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert not missing, missing[:8]
    assert not unexpected, unexpected[:8]
    ref_d.eval()

    ours_r, ours_g, fr, fg = mpd.apply(
        {"params": params}, jnp.asarray(y), jnp.asarray(y_hat)
    )
    with T.no_grad():
        ref_r, ref_g, ref_fr, ref_fg = ref_d(
            T.from_numpy(y.transpose(0, 2, 1)), T.from_numpy(y_hat.transpose(0, 2, 1))
        )
    assert len(ours_r) == len(ref_r) == 6
    for a, b in zip(ours_r, ref_r):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=1e-3, atol=1e-4)
    for a, b in zip(ours_g, ref_g):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=1e-3, atol=1e-4)

    # roundtrip back into flax
    back, report = convert_mpd(sd)
    assert report["missing"] == [] and report["unused"] == []


# ---------------------------------------------------------------------------
# Multi-speaker + voice conversion vs the torch oracle (models.py:1288-1336)
# ---------------------------------------------------------------------------

import dataclasses

MS_CFG = dataclasses.replace(CFG, n_speakers=4, gin_channels=8)


def build_pair_ms(ref_models, cfg=MS_CFG):
    """build_pair for a multi-speaker model (sid threaded through init)."""
    ours = SynthesizerTrn(n_vocab=N_VOCAB, spec_channels=SPEC_CH,
                          segment_frames=4, cfg=cfg)
    x = jnp.asarray([[1, 2, 3, 4, 5, 6, 7]])
    xl = jnp.asarray([7])
    y = jnp.zeros((1, 16, SPEC_CH))
    yl = jnp.asarray([16])
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    params = ours.init(rngs, x, xl, y, yl, sid=jnp.asarray([0]))["params"]
    params = jax.device_get(params)

    sd = export_torch_state_dict(params, cfg)
    sd_t = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    ref = ref_models.SynthesizerTrn(
        N_VOCAB, SPEC_CH, 4,
        inter_channels=cfg.inter_channels,
        hidden_channels=cfg.hidden_channels,
        filter_channels=cfg.filter_channels,
        n_heads=cfg.n_heads,
        n_layers=cfg.n_layers,
        kernel_size=cfg.kernel_size,
        p_dropout=cfg.p_dropout,
        resblock=cfg.resblock,
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in cfg.resblock_dilation_sizes],
        upsample_rates=list(cfg.upsample_rates),
        upsample_initial_channel=cfg.upsample_initial_channel,
        upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
        n_speakers=cfg.n_speakers,
        gin_channels=cfg.gin_channels,
        use_sdp=cfg.use_sdp,
        use_transformer_flows=cfg.use_transformer_flows,
        transformer_flow_type=cfg.transformer_flow_type,
        use_spk_conditioned_encoder=cfg.use_spk_conditioned_encoder,
    )
    missing, unexpected = ref.load_state_dict(sd_t, strict=False)
    assert not missing, f"converter missing keys: {missing[:8]}"
    assert not unexpected, f"converter emitted unknown keys: {unexpected[:8]}"
    ref.eval()
    return ours, params, ref


def test_multispeaker_infer_parity(ref_models, rng):
    """sid-threaded deterministic infer: durations, alignment, and waveform
    must match the reference for every speaker — and speakers must differ
    from each other (the emb_g conditioning is live, not ignored)."""
    ours, params, ref = build_pair_ms(ref_models)
    ids = rng.integers(1, N_VOCAB, 7)
    x = jnp.asarray(ids[None])
    xl = jnp.asarray([7])
    hop = 8  # prod(upsample_rates)
    wavs = []
    for spk in (0, 2):
        audio, attn, y_mask, aux, y_lengths = ours.apply(
            {"params": params}, x, xl, sid=jnp.asarray([spk]),
            noise_scale=0.0, noise_scale_w=0.0, length_scale=1.0,
            max_frames=32, method=SynthesizerTrn.infer,
            rngs={"noise": jax.random.PRNGKey(0)},
        )
        n_frames = int(np.asarray(y_lengths)[0])
        with torch.no_grad():
            o_t, attn_t, mask_t, _ = ref.infer(
                torch.from_numpy(ids[None].astype(np.int64)),
                torch.tensor([7]), sid=torch.tensor([spk]),
                noise_scale=0.0, length_scale=1.0, noise_scale_w=0.0,
            )
        assert n_frames == int(mask_t.sum()) > 0, f"speaker {spk} durations"
        np.testing.assert_array_equal(
            np.asarray(attn)[0, :n_frames], attn_t[0, 0, :n_frames].numpy()
        )
        ours_wav = np.asarray(audio)[0, : n_frames * hop, 0]
        ref_wav = o_t[0, 0, : n_frames * hop].numpy()
        np.testing.assert_allclose(ours_wav, ref_wav, rtol=1e-3, atol=2e-4)
        wavs.append(ours_wav)
    L = min(len(wavs[0]), len(wavs[1]))
    assert np.abs(wavs[0][:L] - wavs[1][:L]).max() > 1e-4, \
        "different speakers must synthesize different audio"


def test_spk_conditioned_encoder_infer_parity(ref_models, rng):
    """use_spk_conditioned_encoder: the mid-stack g-injection in the text
    encoder (attentions.py:76-93, cond_layer_idx=2) threads through infer
    identically."""
    cfg = dataclasses.replace(
        MS_CFG, use_spk_conditioned_encoder=True, n_layers=3
    )
    ours, params, ref = build_pair_ms(ref_models, cfg)
    ids = rng.integers(1, N_VOCAB, 6)
    x = jnp.asarray(ids[None])
    xl = jnp.asarray([6])
    audio, attn, y_mask, aux, y_lengths = ours.apply(
        {"params": params}, x, xl, sid=jnp.asarray([1]),
        noise_scale=0.0, noise_scale_w=0.0, length_scale=1.0,
        max_frames=32, method=SynthesizerTrn.infer,
        rngs={"noise": jax.random.PRNGKey(0)},
    )
    n_frames = int(np.asarray(y_lengths)[0])
    with torch.no_grad():
        o_t, attn_t, mask_t, _ = ref.infer(
            torch.from_numpy(ids[None].astype(np.int64)), torch.tensor([6]),
            sid=torch.tensor([1]),
            noise_scale=0.0, length_scale=1.0, noise_scale_w=0.0,
        )
    assert n_frames == int(mask_t.sum()) > 0
    ours_wav = np.asarray(audio)[0, : n_frames * 8, 0]
    ref_wav = o_t[0, 0, : n_frames * 8].numpy()
    np.testing.assert_allclose(ours_wav, ref_wav, rtol=1e-3, atol=2e-4)


def test_voice_conversion_parity(ref_models, rng, monkeypatch):
    """voice_conversion (models.py:1328-1336): enc_q(sid_src) -> flow forward
    (src) -> flow reverse (tgt) -> dec(tgt), with the posterior's sampling
    noise INJECTED into the reference (torch.randn_like patched to replay our
    eps) so the stochastic path is compared end-to-end, not just the
    deterministic spine."""
    ours, params, ref = build_pair_ms(ref_models)
    T_y = 16
    spec = rng.standard_normal((1, T_y, SPEC_CH)).astype(np.float32) * 0.3
    y = jnp.asarray(spec)
    yl = jnp.asarray([T_y])
    sid_src, sid_tgt = jnp.asarray([1]), jnp.asarray([3])

    o_hat, y_mask, (z, z_p, z_hat) = ours.apply(
        {"params": params}, y, yl, sid_src, sid_tgt,
        method=SynthesizerTrn.voice_conversion,
        rngs={"noise": jax.random.PRNGKey(5)},
    )

    # recover our posterior eps from (z - m_q) / exp(logs_q): m_q/logs_q are
    # deterministic, so a standalone enc_q call reproduces them
    g_src = ours.apply(
        {"params": params}, sid_src,
        method=lambda m, s: m.emb_g(s)[:, None, :],
    )
    _z2, m_q, logs_q, _ym = ours.apply(
        {"params": params}, y, yl, g_src,
        method=lambda m, y, yl, g: m.enc_q(y, yl, g=g, deterministic=True),
        rngs={"noise": jax.random.PRNGKey(99)},
    )
    eps = (np.asarray(z) - np.asarray(m_q)) / np.exp(np.asarray(logs_q))
    eps_t = torch.from_numpy(eps.transpose(0, 2, 1).astype(np.float32))
    monkeypatch.setattr(torch, "randn_like", lambda t: eps_t)

    # latent reference bug: voice_conversion asserts self.n_speakers
    # (models.py:1329) but __init__ never stores the attribute, so the
    # reference's own VC crashes as written. Supply it to run the oracle.
    ref.n_speakers = MS_CFG.n_speakers

    with torch.no_grad():
        o_t, mask_t, (z_t, z_p_t, z_hat_t) = ref.voice_conversion(
            torch.from_numpy(spec.transpose(0, 2, 1)), torch.tensor([T_y]),
            torch.tensor([1]), torch.tensor([3]),
        )
    np.testing.assert_allclose(
        np.asarray(z), z_t.numpy().transpose(0, 2, 1), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(z_p), z_p_t.numpy().transpose(0, 2, 1), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(z_hat), z_hat_t.numpy().transpose(0, 2, 1),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(o_hat)[0, :, 0], o_t[0, 0].numpy(), rtol=1e-3, atol=2e-4
    )
