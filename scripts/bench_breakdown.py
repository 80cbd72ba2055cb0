"""Where does the VITS2 train step's time go? Component-wise breakdown.

VERDICT r1 weak-#1 asked for MFU *and* a named breakdown of the top time
sinks. Profiler traces don't survive the dev tunnel, so each stage of the
training forward is timed as its own jitted function at the production train
shapes (batch 8, 1000-frame bucket, 192 tokens, 32-frame decoder segment):

  enc_p   text prior encoder (rel-pos transformer)
  enc_q   posterior encoder (WN x16)
  flow    residual coupling stack
  mas     alignment DP (Pallas kernel path) incl. the neg_cent einsums
  sdp     stochastic duration predictor (fwd + reverse)
  dec     HiFi-GAN generator on the training segment
  mel     mel-spectrogram of y_hat (XLA rfft path, as in the train step)
  mpd     MultiPeriodDiscriminator on the segment pair
  g_grad  full generator loss fwd+bwd (value_and_grad)
  d_grad  discriminator loss fwd+bwd

Sums of stages won't equal the full step (XLA fuses across stage borders and
the step runs G fwd twice in ddp order) — the point is the *ranking*.

Timing: 20-call dependent chain, one scalar fetch (see CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


PEAK_FLOPS = 197e12  # v5e bf16 MXU peak
PEAK_BW = 819e9  # v5e HBM bytes/s


def _chain(fn, *args, n=20):
    """Returns (seconds/call, flops, bytes accessed) — the latter two from
    XLA cost analysis (None when unavailable), for per-stage roofline floors
    max(flops/PEAK_FLOPS, bytes/PEAK_BW)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(carry, *a):
        s = jnp.sum(fn(*a).astype(jnp.float32)) + carry * 0
        return s

    carry = jnp.zeros(())
    carry = step(carry, *args)
    float(np.asarray(carry))
    t0 = time.perf_counter()
    for _ in range(n):
        carry = step(carry, *args)
    float(np.asarray(carry))
    dt = (time.perf_counter() - t0) / n
    flops = bytes_ = None
    try:
        cost = step.lower(jnp.zeros(()), *args).compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0))
        bytes_ = float(cost.get("bytes accessed", 0.0))
    except Exception:
        pass
    return dt, flops, bytes_


def main():
    import jax
    import jax.numpy as jnp

    from torch_tts_tpu.core.config import VITS2Config
    from torch_tts_tpu.models.vits2 import MultiPeriodDiscriminator, SynthesizerTrn
    from torch_tts_tpu.text import symbols

    cfg = VITS2Config()
    model = SynthesizerTrn(
        n_vocab=len(symbols), spec_channels=cfg.posterior_channels,
        segment_frames=cfg.segment_frames, cfg=cfg.model,
    )
    mpd = MultiPeriodDiscriminator(use_spectral_norm=cfg.model.use_spectral_norm)

    B, T_X, T_Y = 8, 192, 1000
    hop = cfg.audio.hop_length
    seg = cfg.segment_frames
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, len(symbols), (B, T_X)), jnp.int32)
    xl = jnp.full((B,), T_X, jnp.int32)
    spec = jnp.asarray(
        rng.standard_normal((B, T_Y, cfg.posterior_channels)).astype(np.float32)
    )
    yl = jnp.full((B,), T_Y, jnp.int32)

    keys = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    t0 = time.perf_counter()
    variables = jax.jit(lambda: model.init(keys, x, xl, spec, yl))()
    jax.block_until_ready(variables)
    print(f"init: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    rngs = {"noise": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)}

    results = {}

    def run(name, fn, *args):
        """Time one stage; print incrementally; survive transient tunnel
        errors so one flaky remote-compile doesn't void the whole run."""
        try:
            dt, flops, bytes_ = _chain(fn, *args)
            results[name] = {"ms": dt * 1e3, "flops": flops, "bytes": bytes_}
            msg = f"{name:8s} {dt*1e3:8.2f} ms"
            if flops is not None and bytes_:
                floor = max(flops / PEAK_FLOPS, bytes_ / PEAK_BW)
                results[name]["floor_ms"] = floor * 1e3
                bound = ("BW" if bytes_ / PEAK_BW > flops / PEAK_FLOPS
                         else "FLOP")
                msg += (f"  floor {floor*1e3:7.2f} ms ({floor/dt*100:5.1f}% "
                        f"eff, {bound}-bound)  {flops/1e9:8.2f} GF "
                        f"{bytes_/1e6:8.1f} MB")
            print(msg, file=sys.stderr)
        except Exception as e:
            print(f"{name:8s} FAILED: {e}", file=sys.stderr)

    def sub(method):
        def apply(*a):
            return model.apply(variables, *a, method=method, rngs=rngs,
                               mutable=False)
        return apply

    # --- individual stages ---
    enc_p_fn = sub(lambda m, x, xl: m.enc_p(x, xl, deterministic=False)[0])
    run("enc_p", enc_p_fn, x, xl)

    enc_q_fn = sub(lambda m, y, yl: m.enc_q(y, yl, deterministic=False)[0])
    run("enc_q", enc_q_fn, spec, yl)

    z = jnp.asarray(
        rng.standard_normal((B, T_Y, cfg.model.inter_channels)).astype(np.float32)
    )
    y_mask = jnp.ones((B, T_Y, 1), jnp.float32)
    flow_fn = sub(lambda m, z, ym: m.flow(z, ym, deterministic=False))
    run("flow", flow_fn, z, y_mask)

    # MAS: neg_cent einsums + maximum_path at [8, 1000, 192]
    from torch_tts_tpu.kernels.mas import maximum_path

    zp = jnp.asarray(
        rng.standard_normal((B, T_Y, cfg.model.inter_channels)).astype(np.float32)
    )
    mp = jnp.asarray(
        rng.standard_normal((B, T_X, cfg.model.inter_channels)).astype(np.float32)
    )
    lp = jnp.zeros((B, T_X, cfg.model.inter_channels), jnp.float32)
    amask = jnp.ones((B, T_Y, T_X), jnp.float32)

    def mas_fn(zp, mp, lp, amask):
        import math
        s_p_sq_r = jnp.exp(-2 * lp)
        n1 = jnp.sum(-0.5 * math.log(2 * math.pi) - lp, -1)
        n2 = jnp.einsum("btd,bxd->btx", -0.5 * zp**2, s_p_sq_r)
        n3 = jnp.einsum("btd,bxd->btx", zp, mp * s_p_sq_r)
        n4 = jnp.sum(-0.5 * mp**2 * s_p_sq_r, -1)
        neg = n2 + n3 + n1[:, None, :] + n4[:, None, :]
        return maximum_path(neg, amask)

    run("mas", mas_fn, zp, mp, lp, amask)

    hx = jnp.asarray(
        rng.standard_normal((B, T_X, cfg.model.hidden_channels)).astype(np.float32)
    )
    x_mask = jnp.ones((B, T_X, 1), jnp.float32)
    w = jnp.abs(jnp.asarray(
        rng.standard_normal((B, T_X, 1)).astype(np.float32)
    )) + 1.0
    sdp_fn = sub(
        lambda m, hx, xm, w: m.dp(hx, xm, w=w, deterministic=False)
        + jnp.sum(m.dp(hx, xm, reverse=True, noise_scale=1.0, deterministic=False))
    )
    run("sdp", sdp_fn, hx, x_mask, w)

    z_slice = z[:, :seg]
    dec_fn = sub(lambda m, zs: m.dec(zs))
    run("dec", dec_fn, z_slice)

    # --- WN-family fwd+bwd isolation (VERDICT r2 next-#7): what would a
    # fused WN kernel actually buy inside g_grad? enc_q is WN x16, flow is
    # 4 couplings x WN x4 — time each one's full param-grad pass alone.
    def _tree_sum(t):
        return jax.tree_util.tree_reduce(
            lambda acc, l: acc + jnp.sum(jnp.abs(l)), t, jnp.zeros(())
        )

    def encq_loss(p, y, yl):
        zq = model.apply(
            {"params": p}, y, yl, deterministic=False, rngs=rngs,
            method=lambda m, y_, yl_, deterministic: m.enc_q(
                y_, yl_, deterministic=deterministic
            )[0],
        )
        return jnp.sum(zq**2)

    run("enc_q_g", lambda p: _tree_sum(jax.grad(encq_loss)(p, spec, yl)),
        variables["params"])

    def flow_loss(p, z_, ym):
        zf = model.apply(
            {"params": p}, z_, ym, deterministic=False, rngs=rngs,
            method=lambda m, zz, mm, deterministic: m.flow(
                zz, mm, deterministic=deterministic
            ),
        )
        return jnp.sum(zf**2)

    run("flow_g", lambda p: _tree_sum(jax.grad(flow_loss)(p, z, y_mask)),
        variables["params"])

    from torch_tts_tpu.audio import mel as melmod

    y_hat = jnp.asarray(
        (rng.standard_normal((B, seg * hop)) * 0.1).astype(np.float32)
    )
    a = cfg.audio
    run(
        "mel",
        lambda yh: melmod.mel_spectrogram(
            yh, a.filter_length, a.n_mel_channels, a.sampling_rate,
            a.hop_length, a.win_length, a.mel_fmin, a.mel_fmax,
        ),
        y_hat,
    )

    d_vars = jax.jit(lambda: mpd.init(
        {"params": jax.random.PRNGKey(5)},
        jnp.zeros((B, seg * hop, 1)), jnp.zeros((B, seg * hop, 1)),
    ))()
    wav_pair = jnp.asarray(
        (rng.standard_normal((2, B, seg * hop, 1)) * 0.1).astype(np.float32)
    )

    def mpd_fn(pair):
        r, g, _, _ = mpd.apply(d_vars, pair[0], pair[1])
        return sum(jnp.sum(t) for t in r) + sum(jnp.sum(t) for t in g)

    run("mpd", mpd_fn, wav_pair)

    # --- gradient passes ---
    def g_loss(params):
        out = model.apply(
            {"params": params}, x, xl, spec, yl,
            mas_noise_scale=None, deterministic=False, rngs=rngs,
        )
        y_hat2 = out[0]
        return jnp.sum(y_hat2**2) + jnp.sum(out[1])

    run(
        "g_grad",
        lambda p: jax.tree_util.tree_reduce(
            lambda acc, l: acc + jnp.sum(jnp.abs(l)),
            jax.grad(g_loss)(p),
            jnp.zeros(()),
        ),
        variables["params"],
    )

    def d_loss(params):
        r, g, _, _ = mpd.apply({"params": params}, wav_pair[0], wav_pair[1])
        return sum(jnp.sum((1 - t) ** 2) for t in r) + sum(
            jnp.sum(t**2) for t in g
        )

    run(
        "d_grad",
        lambda p: jax.tree_util.tree_reduce(
            lambda acc, l: acc + jnp.sum(jnp.abs(l)),
            jax.grad(d_loss)(p),
            jnp.zeros(()),
        ),
        d_vars["params"],
    )

    print("--- ranked ---", file=sys.stderr)
    for k, v in sorted(results.items(), key=lambda kv: -kv[1]["ms"]):
        print(f"{k:8s} {v['ms']:8.2f} ms", file=sys.stderr)
    print(json.dumps({
        k: {kk: (round(vv, 3) if isinstance(vv, float) else vv)
            for kk, vv in v.items()}
        for k, v in results.items()
    }))


if __name__ == "__main__":
    main()
