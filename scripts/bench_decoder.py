"""A/B the two decoder families on the chip at serving shapes.

Times the decoder alone (latent frames -> waveform, the dominant inference
cost) and the full SynthesizerTrn.infer for:
  - hifigan:  conv upsampling 8-8-2-2 (reference parity, pack_narrow on)
  - mb_istft: conv 4-4 + iSTFT x4 + PQMF x4 (ops/mb_istft.py, ~4x fewer
              decoder FLOPs — arXiv:2210.15975)

Methodology: 20-call dependent chain, one scalar fetch (CLAUDE.md).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _chain(fn, *args, n=20):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(carry, *a):
        return jnp.sum(fn(*a).astype(jnp.float32)) + carry * 0

    carry = jnp.zeros(())
    carry = step(carry, *args)
    float(np.asarray(carry))
    t0 = time.perf_counter()
    for _ in range(n):
        carry = step(carry, *args)
    float(np.asarray(carry))
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from torch_tts_tpu.core.config import VITS2Config
    from torch_tts_tpu.models.vits2 import SynthesizerTrn
    from torch_tts_tpu.text import symbols

    MAX_FRAMES, T_X = 1024, 256
    results = {}
    for name in ("hifigan", "mb_istft"):
        cfg = VITS2Config()
        if name == "hifigan":
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, pack_narrow_convs=True)
            )
        else:
            cfg = dataclasses.replace(
                cfg,
                model=dataclasses.replace(
                    cfg.model, decoder_type="mb_istft",
                    upsample_rates=(4, 4), upsample_kernel_sizes=(16, 16),
                    subbands=4, gen_istft_n_fft=16, gen_istft_hop_size=4,
                ),
            )
        model = SynthesizerTrn(
            n_vocab=len(symbols), spec_channels=cfg.posterior_channels,
            segment_frames=cfg.segment_frames, cfg=cfg.model,
        )
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(1, len(symbols), (1, T_X)), jnp.int32)
        xl = jnp.full((1,), T_X, jnp.int32)
        shapes = jax.eval_shape(lambda m=model: m.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)},
            x, xl, noise_scale=0.667, noise_scale_w=0.8, length_scale=1.0,
            max_frames=MAX_FRAMES, method=SynthesizerTrn.infer))
        host = np.random.default_rng(0)
        variables = jax.tree.map(
            lambda s: jnp.asarray(
                0.02 * host.standard_normal(s.shape).astype("float32"))
            if jnp.issubdtype(s.dtype, jnp.floating)
            else jnp.zeros(s.shape, s.dtype),
            shapes,
        )

        # decoder alone at the full-utterance latent shape
        z = jnp.asarray(
            rng.standard_normal((1, MAX_FRAMES, cfg.model.inter_channels))
            .astype(np.float32)
        )
        dec_fn = lambda zz, m=model, v=variables: m.apply(
            v, zz, method=lambda mm, zzz: mm.dec(zzz))
        dec_ms = _chain(dec_fn, z) * 1e3

        infer_fn = lambda xx, xxl, m=model, v=variables: m.apply(
            v, xx, xxl, noise_scale=0.667, noise_scale_w=0.8,
            length_scale=1.0, max_frames=MAX_FRAMES,
            method=SynthesizerTrn.infer, rngs={"noise": jax.random.PRNGKey(7)},
        )[0]
        infer_ms = _chain(infer_fn, x, xl) * 1e3

        # streaming time-to-first-audio: the non-decoder prefix (enc+dur+
        # flow over the full sequence, = infer - decoder) plus ONE chunk
        # window decode (infer/streaming.py, 128-frame chunk + 2x32 context)
        zwin = z[:, : 128 + 64]
        win_ms = _chain(dec_fn, zwin) * 1e3
        ttfa_ms = (infer_ms - dec_ms) + win_ms
        results[name] = {"decoder_ms": round(dec_ms, 2),
                         "infer_ms": round(infer_ms, 2),
                         "stream_first_chunk_ms": round(win_ms, 2),
                         "ttfa_ms": round(ttfa_ms, 2)}
        print(f"{name}: decoder {dec_ms:.2f} ms, full infer {infer_ms:.2f} ms, "
              f"streaming TTFA ~{ttfa_ms:.2f} ms (first 1.49 s of audio)",
              file=sys.stderr)

    h, m = results["hifigan"], results["mb_istft"]
    print(
        f"mb_istft decoder speedup: {h['decoder_ms']/m['decoder_ms']:.2f}x; "
        f"end-to-end: {h['infer_ms']/m['infer_ms']:.2f}x",
        file=sys.stderr,
    )

    # Streamed flow-reverse (infer/streaming.StreamingFlowDecoder): with the
    # conv-local plain-coupling flow (use_transformer_flows=False — the
    # VITS1-style config; the transformer flows attend globally and cannot be
    # windowed exactly), the flow rides the decoder's chunk window, so TTFA
    # pays prefix(enc+dur+expand) + flowdec(window) instead of
    # prefix + flow(T) + dec(window).
    cfg = VITS2Config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, pack_narrow_convs=True, use_transformer_flows=False
        )
    )
    model = SynthesizerTrn(
        n_vocab=len(symbols), spec_channels=cfg.posterior_channels,
        segment_frames=cfg.segment_frames, cfg=cfg.model,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, len(symbols), (1, T_X)), jnp.int32)
    xl = jnp.full((1,), T_X, jnp.int32)
    shapes = jax.eval_shape(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        x, xl, noise_scale=0.667, noise_scale_w=0.8, length_scale=1.0,
        max_frames=MAX_FRAMES, method=SynthesizerTrn.infer))
    host = np.random.default_rng(0)
    variables = jax.tree.map(
        lambda s: jnp.asarray(
            0.02 * host.standard_normal(s.shape).astype("float32"))
        if jnp.issubdtype(s.dtype, jnp.floating)
        else jnp.zeros(s.shape, s.dtype),
        shapes,
    )
    CHUNK, CTX = 128, 64
    pre_flow_fn = lambda xx, xxl: model.apply(
        variables, xx, xxl, noise_scale=0.667, noise_scale_w=0.8,
        length_scale=1.0, max_frames=MAX_FRAMES,
        method=SynthesizerTrn.infer_pre_flow,
        rngs={"noise": jax.random.PRNGKey(7)},
    )[0]
    pre_flow_ms = _chain(pre_flow_fn, x, xl) * 1e3
    latents_fn = lambda xx, xxl: model.apply(
        variables, xx, xxl, noise_scale=0.667, noise_scale_w=0.8,
        length_scale=1.0, max_frames=MAX_FRAMES,
        method=SynthesizerTrn.infer_latents,
        rngs={"noise": jax.random.PRNGKey(7)},
    )[0]
    latents_ms = _chain(latents_fn, x, xl) * 1e3
    zp_win = jnp.asarray(rng.standard_normal(
        (1, CHUNK + 2 * CTX, cfg.model.inter_channels)).astype(np.float32))
    mwin = jnp.ones((1, CHUNK + 2 * CTX, 1), jnp.float32)

    def flowdec_fn(zp, mm):
        def go(m, zp, mm):
            z = m.flow(zp, mm, reverse=True, deterministic=True)
            return m.dec(z * mm, x_mask=mm)
        return model.apply(variables, zp, mm, method=go)

    flowdec_win_ms = _chain(flowdec_fn, zp_win, mwin) * 1e3
    z_win = zp_win  # same shape for the decoder-only window
    dec_win_ms = _chain(
        lambda zz: model.apply(variables, zz,
                               method=lambda m, zzz: m.dec(zzz)), z_win
    ) * 1e3
    ttfa_flow = pre_flow_ms + flowdec_win_ms
    ttfa_noflow = latents_ms + dec_win_ms
    results["flow_stream"] = {
        "prefix_pre_flow_ms": round(pre_flow_ms, 2),
        "prefix_with_flow_ms": round(latents_ms, 2),
        "flowdec_window_ms": round(flowdec_win_ms, 2),
        "dec_window_ms": round(dec_win_ms, 2),
        "ttfa_flow_streamed_ms": round(ttfa_flow, 2),
        "ttfa_decoder_only_ms": round(ttfa_noflow, 2),
    }
    print(
        f"flow_stream (plain couplings): prefix w/o flow {pre_flow_ms:.2f} ms "
        f"vs w/ flow {latents_ms:.2f} ms; flow+dec window {flowdec_win_ms:.2f} "
        f"ms -> TTFA {ttfa_flow:.2f} ms (decoder-only streaming: "
        f"{ttfa_noflow:.2f} ms)",
        file=sys.stderr,
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
