"""Serving layer for the Tacotron stack: load-once, bucketed, batched,
text -> mel -> waveform in ONE compiled program.

The reference's tacotron inference is a one-shot CLI that rebuilds the model
per invocation and synthesizes a single utterance
(/root/reference/tacotron/inference.py:37-106). This is the production
surface the VITS2 stack already has (infer/serving.py), applied to the AR
model family:

- length-bucketed compilation: texts pad to static (text_len, max_steps)
  buckets, so every request hits a cached executable (the AR scan length is
  a compile-time constant; per-item stop lengths trim the result),
- batch tiers bound the executable cache at len(tiers) x len(buckets),
  padding rows are exact no-ops (pad token embeddings are zeroed and each
  row's AR state is independent) and get discarded host-side,
- the neural vocoder (infer/vocoder.py artifact) is fused INTO the infer
  program — mel renorm + HiFi-GAN decode run in the same XLA executable as
  the AR scan, one dispatch per group, no host round trip between acoustic
  model and vocoder. Without a vocoder artifact it falls back to host-side
  mel inversion + Griffin-Lim (the reference's synth_audio path).

Determinism matches infer/serving.py semantics: explicit seed, but noise
shapes include the batch tier, so identical audio is per (seed, tier).
"""

from __future__ import annotations

import bisect
import logging
from typing import List, Optional, Sequence, Tuple

import numpy as np

from torch_tts_tpu.infer.serving import SynthesisResult, bucket_for, tier_for

logger = logging.getLogger(__name__)

# (max_text_chars, max_decoder_steps): AR steps scale with text length;
# r groups per step, ~1 group per char is generous for English at r>=2
DEFAULT_TACO_BUCKETS = ((32, 100), (64, 200), (128, 400), (256, 800))
DEFAULT_TACO_TIERS = (1, 2, 4)


class TacotronSynthesizer:
    def __init__(
        self,
        cfg,
        variables,
        vocoder=None,
        buckets: Sequence[Tuple[int, int]] = DEFAULT_TACO_BUCKETS,
        batch_tiers: Sequence[int] = DEFAULT_TACO_TIERS,
        griffin_lim_iters: int = 32,
    ):
        import jax

        from torch_tts_tpu.audio.frontend import AudioFrontend
        from torch_tts_tpu.models.tacotron import build_tacotron
        from torch_tts_tpu.text.encoder import TextEncoder

        self.cfg = cfg
        self.model = build_tacotron(cfg)
        self.variables = jax.device_put(variables)
        self.vocoder = vocoder
        if vocoder is not None:
            from torch_tts_tpu.infer.vocoder import check_compat

            check_compat(
                vocoder, num_mels=cfg.audio.num_mels,
                hop_length=cfg.audio.hop_length,
                sample_rate=cfg.audio.sample_rate,
            )
        self.frontend = AudioFrontend(cfg.audio)
        self.encoder = TextEncoder(
            cfg.text.alphabet, cfg.text.character_map,
            cfg.text.bos_symbols or None, cfg.text.eos_symbols or None,
        )
        self.buckets = tuple(sorted(buckets))
        self.batch_tiers = tuple(sorted(batch_tiers))
        self.gl_iters = griffin_lim_iters
        self._fns: dict = {}

    @classmethod
    def from_run_dir(
        cls, config_path: str, run_dir: str,
        vocoder_path: Optional[str] = None, **kw,
    ) -> "TacotronSynthesizer":
        import jax

        from torch_tts_tpu.core.config import load_tacotron_config
        from torch_tts_tpu.train import checkpoint as ckpt

        cfg = load_tacotron_config(config_path)
        # init params to get the structure, then restore
        import jax.numpy as jnp

        from torch_tts_tpu.models.tacotron import build_tacotron

        model = build_tacotron(cfg)
        rngs = {"params": jax.random.PRNGKey(0),
                "noise": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2)}
        dummy_c = jnp.zeros((1, 8), jnp.int32)
        dummy_x = jnp.zeros((1, 2 * cfg.model.r, cfg.audio.num_mels))
        variables = model.init(rngs, dummy_c, jnp.asarray([8], jnp.int32),
                               dummy_x, train=True, deterministic=False)
        latest = ckpt.latest_checkpoint(run_dir)
        if latest:
            loaded = ckpt.restore_checkpoint(
                latest,
                {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})},
            )
            variables = {"params": loaded["params"],
                         "batch_stats": loaded["batch_stats"]}
        else:
            logger.warning("no checkpoint in %s; random init", run_dir)
        vocoder = None
        if vocoder_path:
            from torch_tts_tpu.infer.vocoder import load_vocoder

            vocoder = load_vocoder(vocoder_path)
        return cls(cfg, variables, vocoder=vocoder, **kw)

    # -- bucketing ----------------------------------------------------------

    def _bucket_for(self, n_chars: int) -> Tuple[int, int]:
        return bucket_for(self.buckets, n_chars)

    def _tier_for(self, n: int) -> int:
        return tier_for(self.batch_tiers, n)

    # -- compiled programs --------------------------------------------------

    def _infer_fn(self, batch: int, pad_text: int, max_steps: int):
        key = (batch, pad_text, max_steps)
        fn = self._fns.get(key)
        if fn is not None:
            return fn
        import jax
        import jax.numpy as jnp

        model, voc = self.model, self.vocoder

        if voc is not None:
            gen, vparams = voc.generator, voc.params

            def model_apply_vocoder(mel_log):
                return gen.apply({"params": vparams}, mel_log)[..., 0]

        def infer(variables, c, c_lengths, rng):
            kd, kn = jax.random.split(rng, 2)
            _y, y_post, _s, aux = model.apply(
                variables, c, c_lengths, max_steps=max_steps,
                rngs={"dropout": kd, "noise": kn},
            )
            stop = aux["stop_lengths"]  # decoder groups (steps)
            out = {"stop_lengths": stop, "w": aux["w"]}
            if voc is not None:
                # vocoder fused in-graph: network-domain mel -> wav, one
                # dispatch for the whole text->audio path
                mel_log = (y_post - voc.mel_shift) / voc.mel_scale
                wav = model_apply_vocoder(mel_log)
                out["wav"] = wav
            else:
                out["mel"] = y_post
            return out

        fn = jax.jit(infer)
        self._fns[key] = fn
        return fn

    def warmup(self, tiers: Optional[Sequence[int]] = None) -> None:
        """Precompile the (bucket x tier) grid and force server-side
        completion with a tiny fetch (same discipline as serving.py)."""
        import jax
        import jax.numpy as jnp

        for pad_text, max_steps in self.buckets:
            for t in tiers or self.batch_tiers:
                fn = self._infer_fn(t, pad_text, max_steps)
                c = jnp.zeros((t, pad_text), jnp.int32).at[:, 0].set(1)
                out = fn(self.variables, c,
                         jnp.full((t,), 2, jnp.int32), jax.random.PRNGKey(0))
                np.asarray(out["stop_lengths"])  # force completion

    # -- synthesis ----------------------------------------------------------

    def synthesize(self, texts: Sequence[str], seed: int = 0) -> List[SynthesisResult]:
        import jax
        import jax.numpy as jnp

        r, hop = self.cfg.model.r, self.cfg.audio.hop_length
        ids = [np.asarray(self.encoder.encode(t), np.int32) for t in texts]
        order = sorted(range(len(ids)), key=lambda i: len(ids[i]))
        results: List[Optional[SynthesisResult]] = [None] * len(ids)

        # group by bucket, then dispatch in tier-padded batches
        groups: dict = {}
        for i in order:
            groups.setdefault(self._bucket_for(len(ids[i])), []).append(i)

        for (pad_text, max_steps), idxs in groups.items():
            pos = 0
            while pos < len(idxs):
                take = idxs[pos : pos + self.batch_tiers[-1]]
                pos += len(take)
                tier = self._tier_for(len(take))
                c = np.zeros((tier, pad_text), np.int32)
                cl = np.ones((tier,), np.int32)  # pad rows: 1-token no-ops
                for j, i in enumerate(take):
                    c[j, : len(ids[i])] = ids[i]
                    cl[j] = len(ids[i])
                fn = self._infer_fn(tier, pad_text, max_steps)
                out = fn(self.variables, jnp.asarray(c), jnp.asarray(cl),
                         jax.random.fold_in(jax.random.PRNGKey(seed), tier))
                stop = np.asarray(out["stop_lengths"])
                if self.vocoder is not None:
                    wav = np.asarray(out["wav"])  # [tier, max_steps*r*hop]
                    for j, i in enumerate(take):
                        n = int(stop[j]) * r * hop
                        w = wav[j, :n]
                        peak = max(1e-6, float(np.abs(w).max()))
                        results[i] = SynthesisResult(
                            audio=(w / peak).astype(np.float32),
                            sample_rate=self.cfg.audio.sample_rate,
                            attn=np.asarray(out["w"][j, : int(stop[j])]),
                        )
                else:
                    from torch_tts_tpu.audio.frontend import m_rev

                    mel = np.asarray(out["mel"])
                    for j, i in enumerate(take):
                        m = mel[j, : int(stop[j]) * r]
                        D_db = self.frontend.mel_inv(m_rev(jnp.asarray(m)))
                        w = np.asarray(
                            self.frontend.decode(D_db, n_iter=self.gl_iters)
                        )
                        peak = max(1e-6, float(np.abs(w).max()))
                        results[i] = SynthesisResult(
                            audio=(w / peak).astype(np.float32),
                            sample_rate=self.cfg.audio.sample_rate,
                            attn=np.asarray(out["w"][j, : int(stop[j])]),
                        )
        return results  # type: ignore[return-value]
