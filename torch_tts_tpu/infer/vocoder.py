"""Standalone mel->waveform neural vocoder: artifact format, loader, synth.

Reference parity: the tacotron inference script can hand the predicted
network-domain mel to an external TorchScript vocoder after a fixed affine
renorm ``y_log = (y - 0.911) / 0.0869`` and peak-normalize the result
(/root/reference/tacotron/inference.py:25-34 ``synth_audio_vocoder``,
:84-86 ``torch.jit.load``). The constants map the m_fwd [0, 1] network
domain onto the standardized log-mel input the reference's vocoder was
trained on.

The TPU-native equivalent is self-contained instead of an opaque TorchScript
blob: the in-house HiFi-GAN ``Generator`` (ops/hifigan.py) trained mel->wav
(train/vocoder_train.py) plus a self-describing msgpack artifact carrying the
generator config, the parameters, and the input-domain affine — so synthesis
needs no out-of-band magic constants. The reference pair (0.911, 0.0869) is
the default for artifacts that do not override it.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import numpy as np

# /root/reference/tacotron/inference.py:27 — the affine from the m_fwd
# network domain to the vocoder's standardized log-mel input.
REF_MEL_SHIFT = 0.911
REF_MEL_SCALE = 0.0869

_GEN_FIELDS = (
    "resblock",
    "resblock_kernel_sizes",
    "resblock_dilation_sizes",
    "upsample_rates",
    "upsample_initial_channel",
    "upsample_kernel_sizes",
)


def _tuplify(v):
    if isinstance(v, (list, tuple)):
        return tuple(_tuplify(x) for x in v)
    return v


def _listify(v):
    """msgpack cannot serialize tuples — store nested lists."""
    if isinstance(v, (list, tuple)):
        return [_listify(x) for x in v]
    return v


@dataclasses.dataclass
class Vocoder:
    """A loaded mel->wav vocoder. ``synth`` is the reference's
    ``synth_audio_vocoder`` semantics: affine renorm, generator forward,
    per-item peak normalization."""

    params: Dict[str, Any]
    gen_kwargs: Dict[str, Any]
    sample_rate: int
    num_mels: int
    mel_shift: float = REF_MEL_SHIFT
    mel_scale: float = REF_MEL_SCALE

    def __post_init__(self):
        from torch_tts_tpu.ops.hifigan import Generator

        self.generator = Generator(**self.gen_kwargs)
        self._apply = None

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.gen_kwargs["upsample_rates"]:
            out *= r
        return out

    def _jitted(self):
        if self._apply is None:
            import jax

            def fwd(params, mel_log):
                wav = self.generator.apply({"params": params}, mel_log)
                return wav[..., 0]  # [B, L, 1] -> [B, L]

            self._apply = jax.jit(fwd)
        return self._apply

    def synth(self, mel_net, normalize: bool = True) -> np.ndarray:
        """mel_net [T, M] or [B, T, M] (m_fwd network domain) -> wav [B, L].

        inference.py:25-34: renorm, vocoder forward, wave / |wave|.max().
        """
        import jax.numpy as jnp

        mel = jnp.asarray(mel_net, jnp.float32)
        if mel.ndim == 2:
            mel = mel[None]
        mel_log = (mel - self.mel_shift) / self.mel_scale
        wav = self._jitted()(self.params, mel_log)
        wav = np.asarray(wav)
        if normalize:
            peak = np.maximum(np.abs(wav).max(axis=-1, keepdims=True), 1e-8)
            wav = wav / peak
        return wav


def check_compat(
    voc: "Vocoder", *, num_mels: int, hop_length: int, sample_rate: int
) -> None:
    """Fail fast when a vocoder artifact does not match the acoustic model's
    audio config. All three matter: a mel-count mismatch breaks the graph, a
    hop mismatch silently mis-trims the emitted waveform (callers slice with
    the CONFIG hop), and a sample-rate mismatch writes pitch/speed-shifted
    audio."""
    problems = []
    if voc.num_mels != num_mels:
        problems.append(f"num_mels {voc.num_mels} != config {num_mels}")
    if voc.hop_length != hop_length:
        problems.append(
            f"hop (prod of upsample_rates) {voc.hop_length} != config "
            f"hop_length {hop_length}"
        )
    if voc.sample_rate != sample_rate:
        problems.append(
            f"sample_rate {voc.sample_rate} != config {sample_rate}"
        )
    if problems:
        raise ValueError(
            "vocoder artifact incompatible with audio config: "
            + "; ".join(problems)
        )


def save_vocoder(
    path: str,
    params: Dict[str, Any],
    *,
    gen_kwargs: Dict[str, Any],
    sample_rate: int,
    num_mels: int,
    mel_shift: float = REF_MEL_SHIFT,
    mel_scale: float = REF_MEL_SCALE,
) -> None:
    """Serialize a self-describing vocoder artifact (flax msgpack)."""
    import jax
    from flax import serialization

    meta = {
        "format": "ttsrt-vocoder-v1",
        "sample_rate": int(sample_rate),
        "num_mels": int(num_mels),
        "mel_shift": float(mel_shift),
        "mel_scale": float(mel_scale),
        "gen_kwargs": {
            k: _listify(gen_kwargs[k]) for k in _GEN_FIELDS if k in gen_kwargs
        },
    }
    tree = {"meta": meta, "params": jax.device_get(params)}
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(tree))


def load_vocoder(path: str) -> Vocoder:
    """Load a vocoder artifact written by ``save_vocoder``."""
    from flax import serialization

    with open(path, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    meta = tree["meta"]
    if meta.get("format") != "ttsrt-vocoder-v1":
        raise ValueError(f"{path}: not a ttsrt vocoder artifact ({meta})")
    gen_kwargs = {k: _tuplify(v) for k, v in meta["gen_kwargs"].items()}
    return Vocoder(
        params=tree["params"],
        gen_kwargs=gen_kwargs,
        sample_rate=int(meta["sample_rate"]),
        num_mels=int(meta["num_mels"]),
        mel_shift=float(meta["mel_shift"]),
        mel_scale=float(meta["mel_scale"]),
    )


def export_vocoder_stablehlo(
    voc: Vocoder, max_frames: int, path: Optional[str] = None
) -> bytes:
    """Serialize the vocoder as StableHLO with signature
    (mel_net [1, max_frames, M]) -> wav [1, max_frames*hop] — the same
    jax.export artifact family as infer/export.py, loadable from the C++
    driver."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    def fwd(mel_net):
        mel_log = (mel_net - voc.mel_shift) / voc.mel_scale
        wav = voc.generator.apply({"params": voc.params}, mel_log)
        return wav[..., 0]

    mel = jnp.zeros((1, max_frames, voc.num_mels), jnp.float32)
    blob = jexport.export(jax.jit(fwd))(mel).serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob
