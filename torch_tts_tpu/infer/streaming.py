"""Streaming (chunked) waveform decoding for low time-to-first-audio.

The reference synthesizes a whole utterance per call
(/root/reference/vits2/inference.py:50-60); this module has no reference
counterpart. VITS2's decoder is feed-forward and *local* (convs, iSTFT
overlap-add, PQMF — every output sample depends on a bounded latent
neighborhood), so the waveform can be produced chunk by chunk and the first
audio returned after decoding only `chunk_frames` of latents instead of the
full utterance.

Exactness: each chunk is decoded from a fixed-size window of the latent
sequence that is CLAMPED/shifted inward at the edges (never zero-padded:
conv biases make processed zero frames nonzero, so a zero-pad halo would
corrupt the trim — see the in-code comment at the window computation), then
trimmed to the chunk's own frames. With `context_frames` covering the
decoder's receptive-field half-width, every trimmed chunk is numerically
identical to the corresponding slice of the monolithic decode (verified to
atol=2e-5 by tests/test_streaming.py for both decoder families; float
reassociation across different window offsets makes exact bitwise equality
not guaranteed). The fixed window shape means ONE compiled program
regardless of utterance length or chunk index.

Latency model on TPU: text encoder + duration + flow run once on the full
sequence (cheap, ~25% of inference), then the decoder (the dominant ~75%)
streams: time-to-first-audio drops from decode(T) to
decode(chunk + 2*context), and the per-chunk dispatch chain overlaps with
playback/network in a serving loop.
"""

from __future__ import annotations

import functools
from typing import Iterator, Optional

import jax
import jax.numpy as jnp


class StreamingDecoder:
    """Chunked driver for `model.dec` (HiFi-GAN or MB-iSTFT).

    chunk_frames: latent frames decoded per emitted chunk.
    context_frames: left+right halo gathered around each chunk; must cover
        the decoder's receptive-field half-width in frames (32 is ample for
        both shipped decoders: HiFi-GAN's MRF stack spans < 30 frames and
        the iSTFT/PQMF tail < 2 frames).
    """

    def __init__(self, model, variables, chunk_frames: int = 64,
                 context_frames: int = 32):
        self.model = model
        self.variables = variables
        self.chunk = chunk_frames
        self.ctx = context_frames

        @jax.jit
        def _decode_window(variables, zwin, mwin, g):
            audio = model.apply(
                variables, zwin, mwin, g,
                method=lambda m, zz, mm, gg: m.dec(zz, g=gg, x_mask=mm),
            )
            return audio * jnp.repeat(mwin, audio.shape[1] // zwin.shape[1], 1)

        @jax.jit
        def _decode_window_nog(variables, zwin, mwin):
            audio = model.apply(
                variables, zwin, mwin,
                method=lambda m, zz, mm: m.dec(zz, x_mask=mm),
            )
            return audio * jnp.repeat(mwin, audio.shape[1] // zwin.shape[1], 1)

        self._decode = _decode_window
        self._decode_nog = _decode_window_nog

    def stream(self, z: jax.Array, g: Optional[jax.Array] = None,
               x_mask: Optional[jax.Array] = None) -> Iterator[jax.Array]:
        """z: [B, T, C] latents -> yields [B, chunk*factor, 1] audio chunks.

        Concatenated chunks (trimmed to T*factor total samples) equal the
        monolithic `model.dec(z, x_mask=x_mask)` in the valid region, with
        samples where x_mask == 0 zeroed at sample level — exactly
        `SynthesizerTrn.infer`'s exact-length semantics (pass the y_mask
        from `infer_latents`; the mask window rides along with the latent
        window). The final chunk is shorter when T is not a multiple of
        chunk_frames.
        """
        B, T, C = z.shape
        if x_mask is None:
            x_mask = jnp.ones((B, T, 1), z.dtype)
        ck, ctx = self.chunk, self.ctx
        W = ck + 2 * ctx
        if T <= W:
            # utterance no longer than one window: monolithic is both exact
            # and cheapest
            yield (self._decode(self.variables, z, x_mask, g)
                   if g is not None
                   else self._decode_nog(self.variables, z, x_mask))
            return
        n_chunks = -(-T // ck)

        # Fixed-size windows CLAMPED inside [0, T] (shifted inward at the
        # edges rather than zero-padded): zero input frames are NOT
        # equivalent to the SAME-padding zeros each conv layer inserts
        # (biases make a processed zero-frame nonzero), so edge chunks must
        # see the true sequence boundary exactly like the monolithic decode
        # does. One window shape -> one compiled program.
        factor = None
        for i in range(n_chunks):
            start = min(max(i * ck - ctx, 0), T - W)
            zwin = jax.lax.dynamic_slice_in_dim(z, start, W, 1)
            mwin = jax.lax.dynamic_slice_in_dim(x_mask, start, W, 1)
            audio = (self._decode(self.variables, zwin, mwin, g)
                     if g is not None
                     else self._decode_nog(self.variables, zwin, mwin))
            if factor is None:
                assert audio.shape[1] % W == 0
                factor = audio.shape[1] // W
            lo = (i * ck - start) * factor
            n_keep = min(ck, T - i * ck) * factor
            yield audio[:, lo : lo + n_keep]

    def decode(self, z: jax.Array, g: Optional[jax.Array] = None,
               x_mask: Optional[jax.Array] = None) -> jax.Array:
        """Convenience: run the full stream and concatenate."""
        return jnp.concatenate(list(self.stream(z, g, x_mask)), axis=1)


class StreamingFlowDecoder:
    """Chunked flow-reverse + decode — streams the remaining prefix latency.

    StreamingDecoder still runs the flow reverse on the FULL latent sequence
    before the first chunk decodes; for conv-local flow stacks (plain
    residual couplings, `use_transformer_flows=False` — each coupling is a
    WN dilated-conv stack with a bounded receptive field,
    models/vits2/model.py ResidualCouplingLayer) the flow can ride the same
    clamped window as the decoder, so time-to-first-audio pays only
    flow(window) + dec(window) instead of flow(T) + dec(window).

    NOT available for the transformer flow types (`pre_conv`, `pre_conv2`,
    `fft`, `mono_layer_*`): their pre_transformer/FFT blocks attend over the
    whole sequence (window_size=None), so every output frame depends on every
    input frame and no finite context window reproduces the monolithic
    result. Construction asserts on those configs — use StreamingDecoder
    (monolithic flow + chunked decode) there.

    Exactness: same clamped/shifted fixed-size window scheme as
    StreamingDecoder (see module docstring); `context_frames` must cover the
    flow's receptive-field half-width PLUS the decoder's. The default 64 is
    ample: 4 couplings x WN(4 layers, k5, dil 1) give a flow half-width of
    ~32 frames, the HiFi-GAN MRF < 30, the iSTFT/PQMF tail < 2 (verified to
    2e-5 by tests/test_streaming.py).
    """

    def __init__(self, model, variables, chunk_frames: int = 64,
                 context_frames: int = 64, allow_nonlocal_flow: bool = False):
        cfgm = model.cfg
        if cfgm.use_transformer_flows and not allow_nonlocal_flow:
            raise ValueError(
                "StreamingFlowDecoder requires a conv-local flow "
                "(use_transformer_flows=False); transformer flow type "
                f"'{cfgm.transformer_flow_type}' attends globally. Use "
                "StreamingDecoder, or pass allow_nonlocal_flow=True to "
                "accept approximate output."
            )
        self.model = model
        self.variables = variables
        self.chunk = chunk_frames
        self.ctx = context_frames

        def _window(m, zp, mm, gg):
            z = m.flow(zp, mm, g=gg, reverse=True, deterministic=True)
            audio = m.dec(z * mm, g=gg, x_mask=mm)
            return audio * jnp.repeat(mm, audio.shape[1] // zp.shape[1], 1)

        @jax.jit
        def _decode_window(variables, zpwin, mwin, g):
            return model.apply(variables, zpwin, mwin, g, method=_window)

        @jax.jit
        def _decode_window_nog(variables, zpwin, mwin):
            return model.apply(
                variables, zpwin, mwin, None,
                method=_window,
            )

        self._decode = _decode_window
        self._decode_nog = _decode_window_nog

    def stream(self, z_p: jax.Array, g: Optional[jax.Array] = None,
               y_mask: Optional[jax.Array] = None) -> Iterator[jax.Array]:
        """z_p: [B, T, C] pre-flow latents (SynthesizerTrn.infer_pre_flow)
        -> yields audio chunks; concatenated chunks equal the monolithic
        `dec(flow(z_p, reverse=True) * y_mask)` numerically (2e-5) in the
        valid region, with mask==0 samples zeroed (infer's exact-length
        semantics)."""
        B, T, C = z_p.shape
        if y_mask is None:
            y_mask = jnp.ones((B, T, 1), z_p.dtype)
        ck, ctx = self.chunk, self.ctx
        W = ck + 2 * ctx
        if T <= W:
            yield (self._decode(self.variables, z_p, y_mask, g)
                   if g is not None
                   else self._decode_nog(self.variables, z_p, y_mask))
            return
        n_chunks = -(-T // ck)
        factor = None
        for i in range(n_chunks):
            start = min(max(i * ck - ctx, 0), T - W)
            zwin = jax.lax.dynamic_slice_in_dim(z_p, start, W, 1)
            mwin = jax.lax.dynamic_slice_in_dim(y_mask, start, W, 1)
            audio = (self._decode(self.variables, zwin, mwin, g)
                     if g is not None
                     else self._decode_nog(self.variables, zwin, mwin))
            if factor is None:
                assert audio.shape[1] % W == 0
                factor = audio.shape[1] // W
            lo = (i * ck - start) * factor
            n_keep = min(ck, T - i * ck) * factor
            yield audio[:, lo : lo + n_keep]

    def decode(self, z_p: jax.Array, g: Optional[jax.Array] = None,
               y_mask: Optional[jax.Array] = None) -> jax.Array:
        """Convenience: run the full stream and concatenate."""
        return jnp.concatenate(list(self.stream(z_p, g, y_mask)), axis=1)
