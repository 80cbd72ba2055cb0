"""High-level synthesis API — the serving layer over VITS2.

The reference scatters inference across scripts (inference.py, webui.py,
export_onnx.py) that each rebuild the model; `Synthesizer` is the single
load-once surface the CLIs/web UI here share, designed for production
serving on TPU:

- length-bucketed compilation: texts are padded to a small set of static
  (text, frame) buckets so every request hits a cached executable,
- batched synthesis across requests in the same bucket,
- explicit RNG (same seed -> same audio).
"""

from __future__ import annotations

import bisect
import logging
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# (max_text_tokens, max_frames) tiers; ~5.8 frames/token covers English TTS
DEFAULT_BUCKETS = ((64, 384), (128, 768), (256, 1344), (512, 2048))


@dataclass
class SynthesisResult:
    audio: np.ndarray  # [n_samples] float32
    sample_rate: int
    attn: Optional[np.ndarray] = None


class Synthesizer:
    def __init__(
        self,
        cfg,
        params,
        buckets: Sequence[Tuple[int, int]] = DEFAULT_BUCKETS,
    ):
        import jax

        from torch_tts_tpu.models.vits2 import SynthesizerTrn
        from torch_tts_tpu.train.vits2_trainer import build_models

        self.cfg = cfg
        self.params = params
        self.buckets = sorted(buckets)
        self.model, _, _ = build_models(cfg)
        self._infer_cache = {}
        self._SynthesizerTrn = SynthesizerTrn
        self._jax = jax

    @classmethod
    def from_run_dir(cls, config_path: str, model_dir: str, **kw):
        """Load config + latest checkpoint (or a reference G_*.pth)."""
        import jax
        import jax.numpy as jnp

        from torch_tts_tpu.core.config import load_vits2_config
        from torch_tts_tpu.models.vits2 import SynthesizerTrn
        from torch_tts_tpu.train import checkpoint as ckpt
        from torch_tts_tpu.train.vits2_trainer import build_models

        cfg = load_vits2_config(config_path)
        model, _, _ = build_models(cfg)
        x = jnp.zeros((1, 8), jnp.int32)
        rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2)}
        variables = jax.jit(
            lambda: model.init(rngs, x, jnp.asarray([8], jnp.int32),
                               max_frames=16, method=SynthesizerTrn.infer)
        )()
        params = variables["params"]
        if model_dir.endswith(".pth"):
            from torch_tts_tpu.models.vits2.convert import load_reference_checkpoint

            params, report = load_reference_checkpoint(
                model_dir, cfg.model, target_params=jax.device_get(params)
            )
        else:
            latest = ckpt.latest_checkpoint(model_dir)
            if latest:
                loaded = ckpt.restore_checkpoint(latest, {"params_g": params})
                params = loaded["params_g"]
            else:
                logger.warning("no checkpoint in %s: random weights", model_dir)
        return cls(cfg, params, **kw)

    # ------------------------------------------------------------------

    def _bucket_for(self, n_tokens: int) -> Tuple[int, int]:
        idx = bisect.bisect_left([b[0] for b in self.buckets], n_tokens)
        if idx >= len(self.buckets):
            raise ValueError(
                f"text too long: {n_tokens} tokens > {self.buckets[-1][0]}"
            )
        return self.buckets[idx]

    def _infer_fn(self, batch: int, pad_text: int, max_frames: int):
        key = (batch, pad_text, max_frames)
        fn = self._infer_cache.get(key)
        if fn is None:
            jax = self._jax
            model, Synth = self.model, self._SynthesizerTrn

            @jax.jit
            def fn(params, x, x_lengths, sid, scales, rng):
                audio, attn, y_mask, _aux, y_lengths = model.apply(
                    {"params": params}, x, x_lengths, sid=sid,
                    noise_scale=scales[0], length_scale=scales[1],
                    noise_scale_w=scales[2],
                    max_frames=max_frames, method=Synth.infer,
                    rngs={"noise": rng},
                )
                return audio, y_lengths, attn

            self._infer_cache[key] = fn
        return self._infer_cache[key]

    def encode_text(self, text: str) -> List[int]:
        from torch_tts_tpu.text import intersperse, text_to_sequence

        ids = text_to_sequence(text, list(self.cfg.data.text_cleaners))
        if self.cfg.data.add_blank:
            ids = intersperse(ids, 0)
        return ids

    def synthesize(
        self,
        texts: Sequence[str],
        noise_scale: float = 0.667,
        length_scale: float = 1.0,
        noise_scale_w: float = 0.8,
        sid: Optional[Sequence[int]] = None,
        seed: int = 1234,
        return_attn: bool = False,
    ) -> List[SynthesisResult]:
        """Synthesize a list of texts, batching within length buckets."""
        import jax
        import jax.numpy as jnp

        encoded = [self.encode_text(t) for t in texts]
        order = sorted(range(len(texts)), key=lambda i: len(encoded[i]))
        results: List[Optional[SynthesisResult]] = [None] * len(texts)
        hop = self.cfg.audio.hop_length
        sr = self.cfg.audio.sampling_rate
        scales = jnp.asarray([noise_scale, length_scale, noise_scale_w], jnp.float32)

        # group contiguous same-bucket requests
        groups: List[List[int]] = []
        for i in order:
            b = self._bucket_for(len(encoded[i]))
            if groups and self._bucket_for(len(encoded[groups[-1][-1]])) == b:
                groups[-1].append(i)
            else:
                groups.append([i])

        for group in groups:
            pad_text, max_frames = self._bucket_for(len(encoded[group[-1]]))
            B = len(group)
            x = np.zeros((B, pad_text), np.int32)
            xl = np.zeros((B,), np.int32)
            for row, i in enumerate(group):
                ids = encoded[i]
                x[row, : len(ids)] = ids
                xl[row] = len(ids)
            sid_arr = (
                jnp.asarray([sid[i] for i in group], jnp.int32)
                if sid is not None else None
            )
            fn = self._infer_fn(B, pad_text, max_frames)
            audio, y_lengths, attn = fn(
                self.params, jnp.asarray(x), jnp.asarray(xl), sid_arr, scales,
                jax.random.PRNGKey(seed),
            )
            audio = np.asarray(audio)
            y_lengths = np.asarray(y_lengths)
            for row, i in enumerate(group):
                n = int(y_lengths[row]) * hop
                results[i] = SynthesisResult(
                    audio=audio[row, :n, 0],
                    sample_rate=sr,
                    attn=np.asarray(attn[row]) if return_attn else None,
                )
        return results  # type: ignore[return-value]
