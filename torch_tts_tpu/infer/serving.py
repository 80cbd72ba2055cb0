"""High-level synthesis API — the serving layer over VITS2.

The reference scatters inference across scripts (inference.py, webui.py,
export_onnx.py) that each rebuild the model and serve one request at a time
(vits2/webui.py:65); `Synthesizer` is the single load-once surface the
CLIs/web UI here share, designed for production serving on TPU:

- length-bucketed compilation: texts are padded to a small set of static
  (text, frame) buckets so every request hits a cached executable,
- batch tiers: request groups are padded up to a fixed set of batch sizes
  (default 1/2/8; no 4 — see DEFAULT_BATCH_TIERS), so the executable cache is BOUNDED at
  len(batch_tiers) x len(buckets) programs no matter the traffic pattern
  (padding rows are masked through the whole model and discarded),
- continuous batching: `ContinuousBatcher` drains a request queue into the
  next dispatch, so concurrent callers share TPU batches instead of
  serializing (the reference has no serving loop at all); the loop runs a
  one-deep dispatch pipeline — group k+1 executes on device while group
  k's audio crosses the wire,
- transfer-optimized results: every infer executable emits 16-bit samples
  (half the device->host bytes; the wire is the serving bottleneck on
  tunneled backends) in a ladder of quantized prefix views, so the host
  fetches only the shortest prefix covering the batch's y_lengths and
  never compiles per-shape slice programs,
- explicit RNG (same seed -> same audio; NOTE the noise draw shapes include
  the batch tier, so determinism holds per (seed, tier), not across tiers),
- multi-chip scale-out: pass a `jax.sharding.Mesh` and every executable is
  compiled with the batch tier sharded over the mesh's `data` axis (params
  replicated) — GSPMD splits each dispatch across chips with zero
  collectives (the model is batch-independent), so serving rides the same
  mesh abstraction as training (parallel/mesh.py). Single-controller: one
  process drives the whole mesh (pods under a single JAX runtime).
"""

from __future__ import annotations

import bisect
import logging
import os
import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# (max_text_tokens, max_frames) tiers; ~5.8 frames/token covers English TTS
DEFAULT_BUCKETS = ((64, 384), (128, 768), (256, 1344), (512, 2048))
# No tier 4: fp32 MXU tiles are 8 sublanes deep, so a batch-4 program costs
# within 5% of batch-8 (measured twice: 67.4/67 ms vs 70.7/71 ms — B-sweep,
# artifacts/batch_sweep_r4.json). Groups of 3-8 ride the 8-tier at the same
# latency and the executable grid shrinks by a quarter.
DEFAULT_BATCH_TIERS = (1, 2, 8)


class FetchTimeoutError(RuntimeError):
    """A device->host fetch exceeded its deadline.

    The tunneled TPU in this image has a 'half-down' failure mode where
    dispatch succeeds but result fetches wedge for minutes and ignore
    SIGTERM (CLAUDE.md; r4's driver bench needed 5 pre-flight attempts).
    A serving loop must fail the affected requests and keep draining the
    queue instead of wedging with them."""


def _device_fetch(arr):
    """The raw device->host transfer. Single seam for fault injection in
    tests (monkeypatch this to simulate a wedged tunnel)."""
    return np.asarray(arr)


def fetch_with_deadline(arr, timeout_s: Optional[float]):
    """np.asarray(arr) bounded by a deadline.

    With `timeout_s=None` this is a plain fetch. Otherwise the fetch runs in
    a fresh daemon thread; on expiry a FetchTimeoutError is raised and the
    thread is abandoned (a fetch wedged inside the PJRT client cannot be
    cancelled — it ignores SIGTERM too — so abandoning it is the only way to
    keep the caller alive; the thread exits if/when the tunnel recovers)."""
    if timeout_s is None:
        return _device_fetch(arr)
    box: list = []

    def run():
        try:
            box.append(("ok", _device_fetch(arr)))
        except Exception as e:  # surfaced below if it beat the deadline
            box.append(("err", e))

    t = threading.Thread(target=run, daemon=True, name="tts-fetch")
    t.start()
    t.join(timeout_s)
    if not box:
        raise FetchTimeoutError(
            f"device fetch exceeded {timeout_s:.1f}s deadline "
            "(tunnel half-down? see scripts/tpu_health.py)"
        )
    kind, val = box[0]
    if kind == "err":
        raise val
    return val


def resolve_fetch_timeout(fetch_timeout_s: Optional[float]) -> Optional[float]:
    """ctor arg wins; else the TTS_FETCH_TIMEOUT_S env var; else unbounded.
    Shared by both model families' synthesizers."""
    if fetch_timeout_s is None and os.environ.get("TTS_FETCH_TIMEOUT_S"):
        return float(os.environ["TTS_FETCH_TIMEOUT_S"])
    return fetch_timeout_s


def bucket_for(buckets: Sequence[Tuple[int, int]], n_tokens: int) -> Tuple[int, int]:
    """Smallest (max_len, max_out) bucket admitting n_tokens; raises when the
    text exceeds every bucket (callers split long texts first). Shared by the
    VITS2 and Tacotron serving layers so tiering semantics cannot drift."""
    idx = bisect.bisect_left([b[0] for b in buckets], n_tokens)
    if idx >= len(buckets):
        raise ValueError(
            f"text too long: {n_tokens} tokens > {buckets[-1][0]}"
        )
    return buckets[idx]


def tier_for(batch_tiers: Sequence[int], n: int) -> int:
    """Smallest batch tier >= n (groups larger than the top tier are split
    by the callers — exceeding it is a caller bug, so raise, never clamp)."""
    idx = bisect.bisect_left(list(batch_tiers), n)
    if idx >= len(batch_tiers):
        raise ValueError(
            f"group of {n} exceeds max batch tier {batch_tiers[-1]}"
        )
    return batch_tiers[idx]


@dataclass
class SynthesisResult:
    audio: np.ndarray  # [n_samples] float32
    sample_rate: int
    attn: Optional[np.ndarray] = None


# split preference: sentence end > clause break > any whitespace
_SPLIT_LEVELS = (r"(?<=[.!?;:])\s+", r"(?<=,)\s+", r"\s+")


def split_for_synthesis(text: str, fits) -> List[str]:
    """Split `text` into chunks each satisfying `fits(chunk)`, breaking at
    the coarsest boundary that works (sentence > clause > word), then
    greedily re-merging adjacent pieces while the merge still fits — so
    chunks are as long as the largest bucket allows (fewer dispatches, and
    prosody breaks land on punctuation). Raises ValueError when a single
    unbreakable token exceeds the limit."""
    import re

    def rec(s: str, level: int) -> List[str]:
        if fits(s):
            return [s]
        if level >= len(_SPLIT_LEVELS):
            raise ValueError(f"text piece too long to split: {s[:60]!r}...")
        parts = [p for p in re.split(_SPLIT_LEVELS[level], s) if p]
        if len(parts) == 1:
            return rec(s, level + 1)
        out: List[str] = []
        for p in parts:
            out.extend(rec(p, level + 1))
        return out

    pieces = rec(text.strip(), 0)
    chunks = [pieces[0]]
    for p in pieces[1:]:
        merged = chunks[-1] + " " + p
        if fits(merged):
            chunks[-1] = merged
        else:
            chunks.append(p)
    return chunks


class Synthesizer:
    def __init__(
        self,
        cfg,
        params,
        buckets: Sequence[Tuple[int, int]] = DEFAULT_BUCKETS,
        batch_tiers: Optional[Sequence[int]] = None,
        mesh=None,
        transfer_dtype: str = "int16",
        slice_quanta: int = 8,
        fetch_timeout_s: Optional[float] = None,
    ):
        import jax

        from torch_tts_tpu.models.vits2 import SynthesizerTrn
        from torch_tts_tpu.train.vits2_trainer import build_models

        self.cfg = cfg
        self.mesh = mesh
        n_shard = 1
        if mesh is not None:
            from torch_tts_tpu.parallel.mesh import replicate

            n_shard = int(mesh.size)
            params = replicate(params, mesh)
        if batch_tiers is None:
            # scale the default tiers by the mesh size so every tier splits
            # evenly across chips (one mesh-wide dispatch per group)
            batch_tiers = tuple(t * n_shard for t in DEFAULT_BATCH_TIERS)
        bad = [t for t in batch_tiers if t % n_shard]
        if bad:
            raise ValueError(
                f"batch tiers {bad} not divisible by mesh size {n_shard}"
            )
        if transfer_dtype not in ("int16", "float32"):
            raise ValueError(f"transfer_dtype must be int16/float32, "
                             f"got {transfer_dtype!r}")
        self.transfer_dtype = transfer_dtype
        self.slice_quanta = int(slice_quanta)
        # per-fetch watchdog deadline (None = unbounded). Settable via env
        # for the CLIs/webui without threading a flag through every caller.
        self.fetch_timeout_s = resolve_fetch_timeout(fetch_timeout_s)
        self.params = params
        self.buckets = sorted(buckets)
        self.batch_tiers = sorted(batch_tiers)
        self.model, _, _ = build_models(cfg)
        self._infer_cache = {}   # (tier, pad_text, max_frames) -> jit fn
        self._aux_cache = {}     # streaming prefix fns / StreamingDecoders
        self._SynthesizerTrn = SynthesizerTrn
        self._jax = jax

    def _fetch(self, arr):
        """Deadline-bounded device->host fetch (see fetch_with_deadline)."""
        return fetch_with_deadline(arr, self.fetch_timeout_s)

    @classmethod
    def from_run_dir(cls, config_path: str, model_dir: str,
                     average_last: int = 1, **kw):
        """Load config + latest checkpoint (or a reference G_*.pth).
        average_last=k (run dirs only) loads the uniform average of the last
        k generator checkpoints (checkpoint.average_checkpoints) — the
        standard inference-smoothing trick."""
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
            if latest and average_last > 1:
                paths = ckpt.list_checkpoints(model_dir)[-average_last:]
                loaded = ckpt.average_checkpoints(
                    paths, {"params_g": params}, subtree="params_g"
                )
                params = loaded["params_g"]
                logger.info("averaged %d checkpoints: %s", len(paths),
                            [os.path.basename(p) for p in paths])
            elif latest:
                loaded = ckpt.restore_checkpoint(latest, {"params_g": params})
                params = loaded["params_g"]
            else:
                logger.warning("no checkpoint in %s: random weights", model_dir)
        return cls(cfg, params, **kw)

    # ------------------------------------------------------------------

    def _bucket_for(self, n_tokens: int) -> Tuple[int, int]:
        return bucket_for(self.buckets, n_tokens)

    def _tier_for(self, n: int) -> int:
        return tier_for(self.batch_tiers, n)

    @property
    def max_batch(self) -> int:
        return self.batch_tiers[-1]

    def _infer_fn(self, batch: int, pad_text: int, max_frames: int):
        """One cached executable per (batch tier, bucket). `batch` MUST be a
        tier value — callers pad groups via _tier_for — keeping the cache
        bounded at len(batch_tiers) * len(buckets) entries."""
        assert batch in self.batch_tiers, (batch, self.batch_tiers)
        key = (batch, pad_text, max_frames)
        fn = self._infer_cache.get(key)
        if fn is None:
            jax = self._jax
            model, Synth = self.model, self._SynthesizerTrn

            import jax.numpy as jnp

            Q = self.slice_quanta
            chunk = max(1, (max_frames * self.cfg.audio.hop_length) // Q)

            def fn(params, x, x_lengths, sid, scales, rng):
                audio, attn, y_mask, _aux, y_lengths = model.apply(
                    {"params": params}, x, x_lengths, sid=sid,
                    noise_scale=scales[0], length_scale=scales[1],
                    noise_scale_w=scales[2],
                    max_frames=max_frames, method=Synth.infer,
                    rngs={"noise": rng},
                )
                # Device->host transfer is THE serving bottleneck on
                # tunneled backends (~10 MB/s measured; BASELINE.md), and a
                # host-side `audio[:, :used]` eager slice compiles a fresh
                # XLA program per shape (~10 s each through the tunnel's
                # remote compile). Instead the executable itself emits Q
                # quantized PREFIX views of the audio — device-side copies
                # are ~0.1 ms — and the host fetches only the shortest
                # prefix covering y_lengths: no per-shape slice programs
                # ever, and (by default) 16-bit samples so the transfer
                # bills half the bytes (the WAV/PCM surface is 16-bit
                # anyway; float32 via transfer_dtype for exactness).
                if self.transfer_dtype == "int16":
                    audio = jnp.round(
                        jnp.clip(audio, -1.0, 1.0) * 32767.0
                    ).astype(jnp.int16)
                prefixes = tuple(
                    audio[:, : chunk * (q + 1)] for q in range(Q - 1)
                ) + (audio,)
                return prefixes, y_lengths, attn

            if self.mesh is None:
                fn = jax.jit(fn)
            else:
                # batch tier split over the mesh's data axis, params
                # replicated; the model has no cross-batch ops so GSPMD
                # partitions every dispatch with zero collectives
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P

                bs = NamedSharding(self.mesh, P("data"))
                rep = NamedSharding(self.mesh, P())
                fn = jax.jit(
                    fn,
                    in_shardings=(rep, bs, bs, bs, rep, rep),
                    out_shardings=((bs,) * Q, bs, bs),
                )
            self._infer_cache[key] = fn
        return self._infer_cache[key]

    def warmup(self, tiers: Optional[Sequence[int]] = None,
               buckets: Optional[Sequence[Tuple[int, int]]] = None,
               parallel: int = 4) -> int:
        """Compile (and execute once) every (bucket x tier) executable so
        steady-state traffic never pays a compile — serving processes call
        this at startup. Mixed-length traffic through ContinuousBatcher can
        form a group of ANY size <= max_batch in ANY bucket, so the default
        warms the full grid (len(buckets) x len(batch_tiers) programs; each
        compile is tens of seconds on TPU). Compiles run from `parallel`
        threads — each grid cell is a distinct jit cache entry, so the XLA
        compiles (which release the GIL) overlap and startup costs roughly
        grid/parallel instead of the serial sum. Returns the number of
        cached executables."""
        from concurrent.futures import ThreadPoolExecutor

        import jax
        import jax.numpy as jnp

        scales = jnp.asarray([0.667, 1.0, 0.8], jnp.float32)
        key = jax.random.PRNGKey(0)

        def one(job):
            pad_text, max_frames, tier = job
            fn = self._infer_fn(tier, pad_text, max_frames)
            x = np.zeros((tier, pad_text), np.int32)
            x[:, 0] = 1
            out = fn(self.params, jnp.asarray(x),
                     jnp.ones((tier,), np.int32), None, scales, key)
            # fetch a tiny output rather than block_until_ready: on the
            # tunneled axon backend block_until_ready returns after dispatch
            # while the server-side compile/load finishes lazily — the first
            # FETCH per executable then stalls for it (measured 8-80 s per
            # program). Pulling y_lengths (a few bytes) forces completion so
            # steady-state traffic truly never pays startup cost.
            np.asarray(out[1])

        jobs = [(p, m, t) for p, m in (buckets or self.buckets)
                for t in (tiers or self.batch_tiers)]
        if parallel <= 1:
            for j in jobs:
                one(j)
        else:
            with ThreadPoolExecutor(max_workers=parallel) as ex:
                list(ex.map(one, jobs))  # list() re-raises worker errors
        return len(self._infer_cache)

    def warmup_streaming(
        self,
        chunk_frames: int = 64,
        context_frames: int = 32,
        buckets: Optional[Sequence[Tuple[int, int]]] = None,
    ) -> int:
        """Precompile and force-complete the STREAMING path's executables
        (the batch-1 latents prefix per bucket + the StreamingDecoder
        window programs), so the first /tts_stream request doesn't pay the
        tunneled backend's server-side compile/load stall. Exhausting each
        bucket's stream naturally fetches every chunk, which forces
        completion the same way warmup()'s tiny fetch does. Returns the
        number of buckets warmed."""
        done = 0
        for pad_text, _mf in (buckets or self.buckets):
            # an id list of exactly the bucket's text length pins the bucket
            for _ in self._stream_ids([1] * pad_text, chunk_frames,
                                      context_frames, seed=0):
                pass
            done += 1
        return done

    def encode_text(self, text: str) -> List[int]:
        from torch_tts_tpu.text import intersperse, text_to_sequence

        ids = text_to_sequence(text, list(self.cfg.data.text_cleaners))
        if self.cfg.data.add_blank:
            ids = intersperse(ids, 0)
        return ids

    def _run_group(
        self,
        encoded: Sequence[List[int]],
        scales,
        key,
        sid: Optional[Sequence[int]] = None,
        return_attn: bool = False,
    ) -> List[SynthesisResult]:
        """Synthesize one group of encoded texts (all in the same length
        bucket) with one executable call, padded up to the batch tier.
        Padding rows use a single blank token and are discarded."""
        return self._collect_group(
            self._dispatch_group(encoded, scales, key, sid=sid,
                                 return_attn=return_attn)
        )

    def _dispatch_group(
        self,
        encoded: Sequence[List[int]],
        scales,
        key,
        sid: Optional[Sequence[int]] = None,
        return_attn: bool = False,
    ) -> dict:
        """Dispatch one group and sync on its (tiny) y_lengths fetch —
        which forces device execution — WITHOUT fetching the audio. The
        returned handle goes to `_collect_group`, so callers can overlap
        the next group's dispatch/execution with this group's device->host
        audio transfer (the serving bottleneck on tunneled backends)."""
        import jax.numpy as jnp

        pad_text, max_frames = self._bucket_for(max(len(e) for e in encoded))
        B = len(encoded)
        tier = self._tier_for(B)
        x = np.zeros((tier, pad_text), np.int32)
        xl = np.ones((tier,), np.int32)  # padding rows: 1 blank token
        for row, ids in enumerate(encoded):
            x[row, : len(ids)] = ids
            xl[row] = len(ids)
        sid_arr = None
        if sid is not None:
            sid_pad = list(sid) + [0] * (tier - B)
            sid_arr = jnp.asarray(sid_pad, jnp.int32)
        fn = self._infer_fn(tier, pad_text, max_frames)
        prefixes, y_lengths, attn = fn(
            self.params, jnp.asarray(x), jnp.asarray(xl), sid_arr, scales, key
        )
        return {
            "prefixes": prefixes,
            "y_lengths": self._fetch(y_lengths),
            "attn": attn,
            "B": B,
            "max_frames": max_frames,
            "return_attn": return_attn,
        }

    def _collect_group(self, h: dict) -> List[SynthesisResult]:
        """Fetch the shortest audio prefix covering the group's y_lengths
        and split it into per-request results. Only that prefix crosses the
        wire (padding-row and padded-tail bytes beyond it never do), and no
        host-side slice program is ever compiled — the prefixes are
        outputs of the already-warmed executable."""
        B, y_lengths = h["B"], h["y_lengths"]
        hop = self.cfg.audio.hop_length
        sr = self.cfg.audio.sampling_rate
        prefixes = h["prefixes"]
        full = h["max_frames"] * hop
        chunk = max(1, full // len(prefixes))
        used = min(full, max(1, int(y_lengths[:B].max())) * hop)
        audio = self._fetch(prefixes[min(len(prefixes) - 1,
                                         (used - 1) // chunk)])
        if audio.dtype == np.int16:
            audio = audio.astype(np.float32) / 32767.0
        # debug path: fetch attn as ONE whole-array transfer (a per-row
        # eager slice would compile a program per row index)
        attn = self._fetch(h["attn"]) if h["return_attn"] else None
        return [
            SynthesisResult(
                audio=audio[row, : int(y_lengths[row]) * hop, 0],
                sample_rate=sr,
                attn=attn[row] if attn is not None else None,
            )
            for row in range(B)
        ]

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
        scales = jnp.asarray([noise_scale, length_scale, noise_scale_w], jnp.float32)

        # group contiguous same-bucket requests, capped at the top batch tier
        groups: List[List[int]] = []
        for i in order:
            b = self._bucket_for(len(encoded[i]))
            if (
                groups
                and self._bucket_for(len(encoded[groups[-1][-1]])) == b
                and len(groups[-1]) < self.max_batch
            ):
                groups[-1].append(i)
            else:
                groups.append([i])

        # dispatch every group before collecting any: device execution of
        # group k+1 overlaps the device->host audio transfer of group k
        handles = [
            (group, self._dispatch_group(
                [encoded[i] for i in group], scales, jax.random.PRNGKey(seed),
                sid=[sid[i] for i in group] if sid is not None else None,
                return_attn=return_attn,
            ))
            for group in groups
        ]
        for group, h in handles:
            out = self._collect_group(h)
            for row, i in enumerate(group):
                results[i] = out[row]
        return results  # type: ignore[return-value]

    def _latents_fn(self, pad_text: int, max_frames: int):
        """Cached jitted `infer_latents` per bucket (batch 1): the prefix of
        the streaming path (enc_p + duration + flow reverse)."""
        key = ("latents", pad_text, max_frames)
        fn = self._aux_cache.get(key)
        if fn is None:
            jax = self._jax
            model, Synth = self.model, self._SynthesizerTrn

            @jax.jit
            def fn(params, x, x_lengths, sid, scales, rng):
                return model.apply(
                    {"params": params}, x, x_lengths, sid=sid,
                    noise_scale=scales[0], length_scale=scales[1],
                    noise_scale_w=scales[2],
                    max_frames=max_frames, method=Synth.infer_latents,
                    rngs={"noise": rng},
                )

            self._aux_cache[key] = fn
        return fn

    def stream(
        self,
        text: str,
        chunk_frames: int = 64,
        context_frames: int = 32,
        noise_scale: float = 0.667,
        length_scale: float = 1.0,
        noise_scale_w: float = 0.8,
        sid: Optional[int] = None,
        seed: int = 1234,
    ):
        """Streaming synthesis: yields float32 sample chunks as the decoder
        produces them. Time-to-first-audio pays prefix(bucket) +
        decode(window) instead of the whole decode (~5 ms on a v5e for a
        1.5 s first chunk, BASELINE.md TTFA table). Concatenated chunks are
        numerically identical (2e-5) to `synthesize([text])[0].audio` — same
        bucket, same seed, same exact-length semantics."""
        return self._stream_ids(
            self.encode_text(text), chunk_frames, context_frames,
            noise_scale, length_scale, noise_scale_w, sid, seed,
        )

    def _stream_ids(
        self,
        encoded: List[int],
        chunk_frames: int = 64,
        context_frames: int = 32,
        noise_scale: float = 0.667,
        length_scale: float = 1.0,
        noise_scale_w: float = 0.8,
        sid: Optional[int] = None,
        seed: int = 1234,
    ):
        """stream() on pre-encoded ids (also the warmup entry: an id list
        of exactly a bucket's text length pins that bucket)."""
        import jax
        import jax.numpy as jnp

        from torch_tts_tpu.infer.streaming import StreamingDecoder

        pad_text, max_frames = self._bucket_for(len(encoded))
        x = np.zeros((1, pad_text), np.int32)
        x[0, : len(encoded)] = encoded
        sid_arr = jnp.asarray([sid], jnp.int32) if sid is not None else None
        scales = jnp.asarray(
            [noise_scale, length_scale, noise_scale_w], jnp.float32
        )
        z, g, y_mask, y_lengths = self._latents_fn(pad_text, max_frames)(
            self.params, jnp.asarray(x),
            jnp.asarray([len(encoded)], np.int32), sid_arr, scales,
            jax.random.PRNGKey(seed),
        )
        hop = self.cfg.audio.hop_length
        n_total = int(self._fetch(y_lengths)[0]) * hop

        dkey = ("streamdec", chunk_frames, context_frames)
        sd = self._aux_cache.get(dkey)
        if sd is None:
            sd = StreamingDecoder(self.model, {"params": self.params},
                                  chunk_frames=chunk_frames,
                                  context_frames=context_frames)
            self._aux_cache[dkey] = sd
        emitted = 0
        for piece in sd.stream(z, g, y_mask):
            a = self._fetch(piece)[0, :, 0]
            if emitted + len(a) > n_total:
                a = a[: n_total - emitted]
            emitted += len(a)
            if len(a):
                yield a
            if emitted >= n_total:
                return

    def stream_long(
        self,
        text: str,
        pause_ms: float = 0.0,
        sid: Optional[int] = None,
        seed: int = 1234,
        **stream_kw,
    ):
        """Streaming long-form synthesis: text of any length is split at
        sentence/clause/word boundaries (same chunking as synthesize_long)
        and each piece streams through `stream()` in order, with `pause_ms`
        of silence between pieces — so narration-length requests still get
        first audio at TTFA, and later sentences synthesize while earlier
        ones play."""
        limit = self.buckets[-1][0]
        chunks = split_for_synthesis(
            text, lambda s: len(self.encode_text(s)) <= limit
        )
        sr = self.cfg.audio.sampling_rate
        pause = np.zeros(int(sr * pause_ms / 1000.0), np.float32)
        for i, chunk in enumerate(chunks):
            if i and len(pause):
                yield pause
            yield from self.stream(chunk, sid=sid, seed=seed, **stream_kw)

    def synthesize_long(
        self,
        text: str,
        pause_ms: float = 0.0,
        sid: Optional[int] = None,
        seed: int = 1234,
        **scales,
    ) -> SynthesisResult:
        """Long-form synthesis: text of ANY length is split at sentence (then
        clause, then word) boundaries into chunks that fit the largest bucket,
        the chunks are batch-synthesized through the normal bucketed path
        (same-bucket chunks share dispatches), and the audio is concatenated
        in order with `pause_ms` of silence between chunks. (The reference's
        inference scripts synthesize one fixed text with no chunking,
        vits2/inference.py:13-63; training data is filtered to <=190 tokens,
        vits2/data_utils.py, so long inputs are far out of distribution for
        a single dispatch anyway.)"""
        limit = self.buckets[-1][0]
        chunks = split_for_synthesis(
            text, lambda s: len(self.encode_text(s)) <= limit
        )
        results = self.synthesize(
            chunks, sid=[sid] * len(chunks) if sid is not None else None,
            seed=seed, **scales,
        )
        sr = self.cfg.audio.sampling_rate
        pause = np.zeros(int(sr * pause_ms / 1000.0), np.float32)
        parts: List[np.ndarray] = []
        for i, r in enumerate(results):
            if i and len(pause):
                parts.append(pause)
            parts.append(r.audio)
        return SynthesisResult(audio=np.concatenate(parts), sample_rate=sr)


@dataclass
class _Request:
    encoded: List[int]
    scales_key: Tuple[float, float, float]
    seed: int
    sid: Optional[int]
    future: Future


class ContinuousBatcher:
    """Queue-based continuous batching over a Synthesizer.

    Concurrent callers `submit()` texts and get Futures; a worker loop drains
    everything already queued into the next TPU dispatch (grouped by length
    bucket and scale settings, padded to the batch tier). New requests are
    admitted into the *next* batch as soon as the current one dispatches —
    latency under load is one in-flight batch, not a serial queue.

    RNG policy: each dispatched group uses PRNGKey(seed of the first request
    in the group); per-request bit-reproducibility therefore holds only when
    the group composition is reproduced (batch composition is
    traffic-dependent by design).
    """

    def __init__(self, synth: Synthesizer, max_queue: int = 1024,
                 autostart: bool = True):
        self.synth = synth
        self._q: "queue.Queue[_Request]" = queue.Queue(max_queue)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._stats_lock = threading.Lock()
        self._stats = {
            "requests_total": 0,
            "failures_total": 0,
            "fetch_timeouts_total": 0,
            "batches_total": 0,
            "batched_requests_total": 0,
            "dispatch_ms_sum": 0.0,
        }
        if autostart:
            self.start()

    def stats(self) -> dict:
        """Snapshot of serving counters (plus live queue depth)."""
        with self._stats_lock:
            s = dict(self._stats)
        s["queue_depth"] = self._q.qsize()
        return s

    def _count(self, **deltas) -> None:
        with self._stats_lock:
            for k, v in deltas.items():
                self._stats[k] += v

    def start(self) -> None:
        if self._thread is None:
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()

    def close(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30)
            self._thread = None

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.close()

    def submit(
        self,
        text: str,
        noise_scale: float = 0.667,
        length_scale: float = 1.0,
        noise_scale_w: float = 0.8,
        sid: Optional[int] = None,
        seed: int = 1234,
    ) -> Future:
        """Enqueue one request; the Future resolves to a SynthesisResult."""
        fut: Future = Future()
        req = _Request(
            encoded=self.synth.encode_text(text),
            scales_key=(noise_scale, length_scale, noise_scale_w),
            seed=seed,
            sid=sid,
            future=fut,
        )
        self._q.put(req)
        self._count(requests_total=1)
        return fut

    # -- worker ---------------------------------------------------------

    def _drain(self) -> List[_Request]:
        """Block for the first request, then take everything already queued."""
        try:
            first = self._q.get(timeout=0.05)
        except queue.Empty:
            return []
        batch = [first]
        while True:
            try:
                batch.append(self._q.get_nowait())
            except queue.Empty:
                return batch

    def _loop(self) -> None:
        import time

        import jax
        import jax.numpy as jnp

        # one-deep dispatch pipeline: the previous group's device->host
        # audio transfer (the dominant steady-state cost through the
        # tunnel) is collected AFTER the next group has been dispatched,
        # so device execution and host transfer overlap. `pending` is the
        # one in-flight (handle, requests, bucket, t0); it is collected
        # when the next group dispatches, when the queue goes idle, or on
        # shutdown — a future can therefore wait at most one drain
        # timeout (50 ms) beyond its transfer.
        pending = None

        def collect(p):
            h, bin_reqs, bucket, t0 = p
            try:
                out = self.synth._collect_group(h)
                for r, res in zip(bin_reqs, out):
                    r.future.set_result(res)
            except Exception as e:  # surface the error to callers; a
                # FetchTimeoutError (half-down tunnel) fails THIS group
                # fast while the loop keeps draining the queue
                for r in bin_reqs:
                    if not r.future.done():
                        r.future.set_exception(e)
                self._count(failures_total=len(bin_reqs))
                if isinstance(e, FetchTimeoutError):
                    self._count(fetch_timeouts_total=1)
                    logger.warning("collect: %s", e)
            dt = time.perf_counter() - t0
            self._count(batches_total=1,
                        batched_requests_total=len(bin_reqs),
                        dispatch_ms_sum=dt * 1e3)
            log = logger.warning if dt > 2.0 else logger.debug
            log("batch dispatch: B=%d bucket=%s %.0f ms",
                len(bin_reqs), bucket, dt * 1e3)

        while not self._stop.is_set():
            reqs = self._drain()
            if not reqs:
                if pending is not None:
                    collect(pending)
                    pending = None
                continue
            # group by (bucket, scales, multispeaker-ness); cap at max tier.
            # Per-request failures (e.g. text longer than the largest
            # bucket) surface on THAT request's future — the loop thread
            # must never die, or every in-flight future hangs to timeout.
            groups: dict = {}
            for r in reqs:
                try:
                    bucket = self.synth._bucket_for(len(r.encoded))
                except Exception as e:
                    r.future.set_exception(e)
                    self._count(failures_total=1)
                    continue
                gkey = (bucket, r.scales_key, r.sid is not None)
                bins = groups.setdefault(gkey, [[]])
                if len(bins[-1]) >= self.synth.max_batch:
                    bins.append([])
                bins[-1].append(r)
            for (bucket, scales_key, has_sid), bins in groups.items():
                scales = jnp.asarray(scales_key, jnp.float32)
                for bin_reqs in bins:
                    t0 = time.perf_counter()
                    try:
                        h = self.synth._dispatch_group(
                            [r.encoded for r in bin_reqs],
                            scales,
                            jax.random.PRNGKey(bin_reqs[0].seed),
                            sid=[r.sid for r in bin_reqs] if has_sid else None,
                        )
                    except Exception as e:
                        for r in bin_reqs:
                            if not r.future.done():
                                r.future.set_exception(e)
                        self._count(failures_total=len(bin_reqs),
                                    batches_total=1,
                                    batched_requests_total=len(bin_reqs))
                        if isinstance(e, FetchTimeoutError):
                            self._count(fetch_timeouts_total=1)
                            logger.warning("dispatch: %s", e)
                        continue
                    if pending is not None:
                        collect(pending)
                    pending = (h, bin_reqs, bucket, t0)
        if pending is not None:
            collect(pending)
