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
        fetch_timeout_s: Optional[float] = None,
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
        self._fns: dict = {}  # (tier, pad_text, max_steps) -> batch program
        self._stream_cache: dict = {}  # streaming program triples per bucket
        # per-fetch watchdog (half-down tunnel protection; see
        # serving.fetch_with_deadline). None = unbounded.
        from torch_tts_tpu.infer.serving import resolve_fetch_timeout

        self.fetch_timeout_s = resolve_fetch_timeout(fetch_timeout_s)

    def _fetch(self, arr):
        from torch_tts_tpu.infer.serving import fetch_with_deadline

        return fetch_with_deadline(arr, self.fetch_timeout_s)

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
            # dropout_key passed EXPLICITLY (not via the rngs stream): the
            # decoder derives per-step masks as fold_in(kd, step), which is
            # what lets stream() reproduce the tier-1 batch decode exactly
            _y, y_post, _s, aux = model.apply(
                variables, c, c_lengths, max_steps=max_steps,
                dropout_key=kd,
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

    def warmup_streaming(self, chunk_steps: int = 32,
                         pad_frames: int = 48) -> int:
        """Precompile the per-bucket stream programs (enc/chunk/emit) so the
        first streamed request pays no compile; returns program count."""
        import jax
        import jax.numpy as jnp

        if self.vocoder is None:
            return 0
        n = 0
        for pad_text, max_steps in self.buckets:
            enc, chunk, emit, chunk_frames, W = self._stream_fns(
                pad_text, max_steps, chunk_steps, pad_frames
            )
            if max_steps < chunk_steps or max_steps * self.cfg.model.r < W:
                continue  # bucket too small to stream; requests fall back
            c = jnp.zeros((1, pad_text), jnp.int32).at[:, 0].set(1)
            memory, mmask, carry, buf = enc(self.variables, c,
                                            jnp.asarray([2], jnp.int32))
            carry, buf, stopped = chunk(
                self.variables, memory, mmask, carry,
                jnp.asarray(0, jnp.int32), jax.random.PRNGKey(0), buf,
            )
            np.asarray(stopped)  # force completion
            wav = emit(self.variables, buf, jnp.asarray(0, jnp.int32),
                       jnp.asarray(max_steps * self.cfg.model.r, jnp.int32))
            np.asarray(wav[0, :4])
            n += 3
        return n

    # -- streaming ----------------------------------------------------------
    #
    # Chunked low-TTFA synthesis for the AR family (no reference
    # counterpart; the VITS2 analogue is infer/streaming.py). Three compiled
    # programs per bucket, each shape-static so chunk index never recompiles:
    #   encode: text -> (memory, mmask, AR carry)        [once per utterance]
    #   chunk:  K decoder groups from global step t0, written into a
    #           persistent [1, max_steps*r, M] mel buffer on device
    #   emit:   clamped window [o, o+W) of the buffer -> postnet -> renorm ->
    #           vocoder -> the center chunk_frames*hop samples
    # Exactness: per-step prenet-dropout keys are a pure function of
    # (key, global step) (models/tacotron/model.py decode_chunk), so chunked
    # mel == monolithic mel bit-for-bit; postnet (RF 6 frames) and HiFi-GAN
    # (RF < 30 frames) are local, so emitting >= pad_frames away from window
    # edges reproduces postnet+vocoder applied to the WHOLE trimmed mel
    # (reference semantics: inference.py postnets the decoded length).
    # Early stop is also a throughput win: the monolithic bucket program
    # always scans max_steps; the stream stops decoding at the stop token.
    # Chunks are NOT peak-normalized (the global peak is unknowable online).

    def _stream_fns(self, pad_text: int, max_steps: int, chunk_steps: int,
                    pad_frames: int):
        key = (pad_text, max_steps, chunk_steps, pad_frames)
        fns = self._stream_cache.get(key)
        if fns is not None:
            return fns
        import jax
        import jax.numpy as jnp

        from torch_tts_tpu.models.tacotron import Tacotron

        model, voc = self.model, self.vocoder
        r, M = self.cfg.model.r, self.cfg.audio.num_mels
        K = chunk_steps
        chunk_frames = K * r
        W = chunk_frames + 2 * pad_frames
        # whole chunks: when max_steps % K != 0 the tail chunk overhangs
        # max_steps — the buffer holds the overhang, emission clamps to the
        # valid max_steps*r frames (otherwise the tail steps of the decode
        # would silently never run; 3 of the 4 default buckets hit this)
        T_buf = (-(-max_steps // K)) * K * r

        @jax.jit
        def enc(variables, c, c_lengths):
            memory, mmask = model.apply(variables, c, c_lengths,
                                        method=Tacotron.encode)
            carry = model.apply(variables, memory,
                                method=Tacotron.decode_init)
            buf = jnp.zeros((1, T_buf, M), memory.dtype)
            return memory, mmask, carry, buf

        @jax.jit
        def chunk(variables, memory, mmask, carry, t0, dkey, buf):
            carry, y, stopped, _w = model.apply(
                variables, memory, mmask, carry, t0, dkey, K,
                method=Tacotron.decode_chunk,
            )
            buf = jax.lax.dynamic_update_slice(buf, y, (0, t0 * r, 0))
            return carry, buf, stopped

        @jax.jit
        def emit(variables, buf, start, total):
            # window clamped inside [0, total): interior emission is exact
            # by conv locality; at the edges the window boundary coincides
            # with the true signal boundary, so conv zero-padding matches
            # the full computation
            o = jnp.clip(start - pad_frames, 0, jnp.maximum(total - W, 0))
            y_win = jax.lax.dynamic_slice(buf, (0, o, 0), (1, W, M))
            y_post = model.apply(variables, y_win,
                                 method=Tacotron.apply_postnet)
            mel_log = (y_post - voc.mel_shift) / voc.mel_scale
            wav = voc.generator.apply({"params": voc.params}, mel_log)[..., 0]
            hop = self.cfg.audio.hop_length
            return jax.lax.dynamic_slice(
                wav, (0, (start - o) * hop), (1, chunk_frames * hop)
            )

        fns = (enc, chunk, emit, chunk_frames, W)
        self._stream_cache[key] = fns
        return fns

    def stream(self, text: str, seed: int = 0, chunk_steps: int = 32,
               pad_frames: int = 48):
        """Yield float32 waveform chunks for one utterance (B=1), first audio
        after ~2 AR chunks instead of the full max_steps decode. Requires a
        vocoder artifact. Utterances shorter than one emission window fall
        back to the batch path (one monolithic dispatch) — the window cannot
        straddle the whole signal exactly otherwise."""
        if self.vocoder is None:
            raise ValueError("streaming requires a vocoder artifact "
                             "(Griffin-Lim is not chunkable)")
        import jax
        import jax.numpy as jnp

        ids = np.asarray(self.encoder.encode(text), np.int32)
        pad_text, max_steps = self._bucket_for(len(ids))
        r, hop = self.cfg.model.r, self.cfg.audio.hop_length
        if (max_steps < chunk_steps
                or max_steps * r < chunk_steps * r + 2 * pad_frames):
            # bucket too small for one emission window (same guard as
            # warmup_streaming): monolithic batch path, no stream programs
            res = self.synthesize([text], seed=seed)[0]
            yield res.audio
            return
        enc, chunk, emit, chunk_frames, W = self._stream_fns(
            pad_text, max_steps, chunk_steps, pad_frames
        )
        T_valid = max_steps * r  # frames beyond this are decode overhang
        c = np.zeros((1, pad_text), np.int32)
        c[0, : len(ids)] = ids
        cl = jnp.asarray([len(ids)], jnp.int32)

        base = jax.random.fold_in(jax.random.PRNGKey(seed), 1)
        kd, _kn = jax.random.split(base)
        memory, mmask, carry, buf = enc(self.variables, jnp.asarray(c), cl)

        # one-chunk emission lookahead beyond the receptive-field margin: any
        # LATER stop then lands past an emission's window, which (with
        # emitted > 0) guarantees total >= W so the flush below stays exact —
        # and total < W implies nothing was yielded yet, so the
        # short-utterance fallback is clean. The max(.., W) keeps that
        # invariant when chunk_frames < pad_frames (total >= decoded at first
        # emission >= threshold >= W).
        threshold = max(2 * chunk_frames + pad_frames, W)
        emitted = 0
        t_final = None  # frames
        flush_buf = buf
        pending = None  # (t0_steps, stopped_dev, buf_dev)

        def process(p):
            """Examine a COMPLETED chunk: detect the stop token, emit every
            window that is final-safe. Returns the ready audio chunks."""
            nonlocal t_final, emitted, flush_buf
            t0_p, stopped_p, buf_p = p
            flush_buf = buf_p
            # clamp to the valid region: the tail chunk may overhang
            # max_steps, and a stop flag in the overhang is equivalent to
            # the batch path's truncation at max_steps
            decoded_p = min((t0_p + chunk_steps) * r, T_valid)
            flags = self._fetch(stopped_p[0])  # the per-chunk host sync
            if flags.any():
                t_final = min((t0_p + int(np.argmax(flags)) + 1) * r, T_valid)
                return []
            outs = []
            while decoded_p - emitted >= threshold:
                wav = self._fetch(emit(self.variables, buf_p,
                                       jnp.asarray(emitted, jnp.int32),
                                       jnp.asarray(decoded_p, jnp.int32)))[0]
                outs.append(wav.astype(np.float32))
                emitted += chunk_frames
            return outs

        n_chunks = -(-max_steps // chunk_steps)
        for t0 in range(0, n_chunks * chunk_steps, chunk_steps):
            # dispatch THIS chunk before syncing the previous one's stop
            # flags: a one-deep pipeline — the AR scan executes on device
            # while the host examines the last chunk, hiding the per-chunk
            # round trip (it dominates TTFA through a tunneled backend). A
            # stop found in chunk k wastes the already-dispatched k+1.
            carry, buf, stopped = chunk(
                self.variables, memory, mmask, carry,
                jnp.asarray(t0, jnp.int32), kd, buf,
            )
            if pending is not None:
                for wav in process(pending):
                    yield wav
                if t_final is not None:
                    break
            pending = (t0, stopped, buf)
        if t_final is None and pending is not None:
            for wav in process(pending):
                yield wav
        total = t_final if t_final is not None else (
            min((pending[0] + chunk_steps) * r, T_valid)
            if pending is not None else 0
        )
        if total < W:
            # too short for an exact flush window; emitted == 0 (see above):
            # one monolithic dispatch through the batch path
            assert emitted == 0
            res = self.synthesize([text], seed=seed)[0]
            yield res.audio
            return
        while emitted < total:
            start = max(0, min(emitted, total - chunk_frames))
            wav = self._fetch(emit(self.variables, flush_buf,
                                   jnp.asarray(start, jnp.int32),
                                   jnp.asarray(total, jnp.int32)))[0]
            new = wav[(emitted - start) * hop : (total - start) * hop]
            if new.size:
                yield new.astype(np.float32)
            emitted = min(start + chunk_frames, total)

    # -- synthesis ----------------------------------------------------------

    def encode_text(self, text: str) -> np.ndarray:
        return np.asarray(self.encoder.encode(text), np.int32)

    @property
    def max_batch(self) -> int:
        return self.batch_tiers[-1]

    def _dispatch_group(
        self,
        encoded: Sequence[np.ndarray],
        scales=None,
        key=None,
        sid=None,
        return_attn: bool = False,
    ) -> dict:
        """Dispatch one tier-padded group and sync on the (tiny)
        stop_lengths fetch — forcing device execution — WITHOUT fetching the
        audio; `_collect_group` pays that transfer. Same split (and the same
        signature) as Synthesizer._dispatch_group, so ContinuousBatcher
        drives both model families. `scales` is accepted and ignored (the AR
        path has no noise/length scales); `sid` must be None (no
        multi-speaker tacotron). `return_attn` defaults False (matching
        Synthesizer) so batcher-driven serving never pays the
        [tier, max_steps, pad_text] attention transfer nobody reads —
        `synthesize()` opts in for the CLI's alignment plots."""
        import jax
        import jax.numpy as jnp

        if sid is not None:
            raise ValueError("tacotron serving has no speaker ids")
        pad_text, max_steps = self._bucket_for(max(len(e) for e in encoded))
        B = len(encoded)
        tier = self._tier_for(B)
        c = np.zeros((tier, pad_text), np.int32)
        cl = np.ones((tier,), np.int32)  # pad rows: 1-token no-ops
        for j, e in enumerate(encoded):
            c[j, : len(e)] = e
            cl[j] = len(e)
        fn = self._infer_fn(tier, pad_text, max_steps)
        if key is None:
            key = jax.random.PRNGKey(0)
        out = fn(self.variables, jnp.asarray(c), jnp.asarray(cl),
                 jax.random.fold_in(key, tier))
        return {
            "out": out,
            "stop": self._fetch(out["stop_lengths"]),
            "B": B,
            "return_attn": return_attn,
        }

    def _collect_group(self, h: dict) -> List[SynthesisResult]:
        import jax.numpy as jnp

        r, hop = self.cfg.model.r, self.cfg.audio.hop_length
        out, stop, B = h["out"], h["stop"], h["B"]
        attn = self._fetch(out["w"]) if h["return_attn"] else None
        results = []
        if self.vocoder is not None:
            wav = self._fetch(out["wav"])  # [tier, max_steps*r*hop]
            for j in range(B):
                n = int(stop[j]) * r * hop
                w = wav[j, :n]
                peak = max(1e-6, float(np.abs(w).max()))
                results.append(SynthesisResult(
                    audio=(w / peak).astype(np.float32),
                    sample_rate=self.cfg.audio.sample_rate,
                    attn=attn[j, : int(stop[j])] if attn is not None else None,
                ))
        else:
            from torch_tts_tpu.audio.frontend import m_rev

            mel = self._fetch(out["mel"])
            for j in range(B):
                m = mel[j, : int(stop[j]) * r]
                D_db = self.frontend.mel_inv(m_rev(jnp.asarray(m)))
                w = np.asarray(
                    self.frontend.decode(D_db, n_iter=self.gl_iters)
                )
                peak = max(1e-6, float(np.abs(w).max()))
                results.append(SynthesisResult(
                    audio=(w / peak).astype(np.float32),
                    sample_rate=self.cfg.audio.sample_rate,
                    attn=attn[j, : int(stop[j])] if attn is not None else None,
                ))
        return results

    def synthesize(self, texts: Sequence[str], seed: int = 0) -> List[SynthesisResult]:
        import jax

        ids = [self.encode_text(t) for t in texts]
        order = sorted(range(len(ids)), key=lambda i: len(ids[i]))
        results: List[Optional[SynthesisResult]] = [None] * len(ids)

        # group by bucket, then dispatch in tier-padded batches
        groups: dict = {}
        for i in order:
            groups.setdefault(self._bucket_for(len(ids[i])), []).append(i)

        key = jax.random.PRNGKey(seed)
        for (_pad_text, _max_steps), idxs in groups.items():
            pos = 0
            while pos < len(idxs):
                take = idxs[pos : pos + self.max_batch]
                pos += len(take)
                h = self._dispatch_group([ids[i] for i in take], key=key,
                                         return_attn=True)
                for j, res in enumerate(self._collect_group(h)):
                    results[take[j]] = res
        return results  # type: ignore[return-value]
