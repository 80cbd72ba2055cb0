"""Unified configuration system.

The reference repo has four coexisting config systems (tacotron YAML +
argparse, AudioFrontendConfig dataclass, vits2 JSON HParams attr-dict, and a
Lightning CLI dataclass pair — see SURVEY.md §5). Here everything is a plain
frozen-able dataclass with a single `from_dict`/YAML/JSON ingestion path that
can also read the reference's own config files for parity runs
(/root/reference/configs/config-ljspeech.yaml, /root/reference/vits2/configs/ljspeech.yaml).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Tuple


def _apply(cfg, d: dict):
    """Dataclass update from dict, ignoring unknown keys (lenient like
    vits2/utils.py HParams)."""
    names = {f.name for f in dataclasses.fields(cfg)}
    kwargs = {k: v for k, v in d.items() if k in names}
    return dataclasses.replace(cfg, **kwargs)


@dataclass(frozen=True)
class AudioConfig:
    """Signal frontend parameters (vits2 DataConfig + tacotron AudioFrontendConfig)."""

    sampling_rate: int = 22050
    filter_length: int = 1024  # n_fft
    hop_length: int = 256
    win_length: int = 1024
    n_mel_channels: int = 80
    mel_fmin: float = 0.0
    mel_fmax: Optional[float] = None
    max_wav_value: float = 32768.0


@dataclass(frozen=True)
class VITS2ModelConfig:
    """Canonical VITS2 hyperparameters (defaults = vits2/cli.py ModelConfig:143-190)."""

    inter_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    p_dropout: float = 0.1
    resblock: str = "1"
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5),
        (1, 3, 5),
        (1, 3, 5),
    )
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)

    n_speakers: int = 0
    gin_channels: int = 0
    use_sdp: bool = True
    # the reference hardcodes p=0.5 inside both duration predictors
    # (models.py:1203-1208) independent of p_dropout; configurable here so
    # lockstep parity tests can zero the one un-injectable noise source
    dp_dropout: float = 0.5
    use_spk_conditioned_encoder: bool = False
    use_transformer_flows: bool = True
    transformer_flow_type: str = "pre_conv"
    use_noise_scaled_mas: bool = True
    mas_noise_scale_initial: float = 0.01
    noise_scale_delta: float = 2e-6
    use_spectral_norm: bool = False
    use_mel_posterior_encoder: bool = True
    use_duration_discriminator: bool = False
    duration_discriminator_type: str = "dur_disc_1"
    # TPU perf: space-to-depth packing of the HiFi-GAN tail (exact-equivalent
    # outputs; see ops/packed_conv.py)
    pack_narrow_convs: bool = False
    # int8 W8A8 dynamic-quant INFERENCE on the decoder's wide conv stages
    # (approximate — quality gated in BASELINE.md; never used in training;
    # ops/quant.py)
    quantize_decoder: bool = False
    # fused MRF Pallas kernel for the decoder's unpacked C<=128 resblock
    # banks (exact; inference-only wiring; kernels/mrf_fused.py)
    fuse_mrf: bool = False
    # decoder family: "hifigan" (reference parity) or "mb_istft" (beyond
    # parity: the MB-iSTFT-VITS lightweight decoder, ops/mb_istft.py — the
    # conv trunk stops at prod(upsample_rates) and an iSTFT head + fixed
    # PQMF bank synthesize the remaining istft_hop * subbands upsampling;
    # prod(upsample_rates) * gen_istft_hop_size * subbands must equal the
    # audio hop_length, e.g. 4*4 * 4 * 4 = 256). With mb_istft, set
    # upsample_rates: [4, 4] and upsample_kernel_sizes: [16, 16].
    decoder_type: str = "hifigan"
    subbands: int = 4
    gen_istft_n_fft: int = 16
    gen_istft_hop_size: int = 4

    segment_size: int = 8192  # in samples

    # Structural depth knobs (defaults = reference parity: WN(16) posterior
    # models.py:858-897, 4 coupling steps models.py:813-855). Only non-default
    # in throwaway configs that must compile fast (e.g. the driver's
    # dryrun_multichip tiny config) — sharding correctness doesn't depend on
    # depth, compile time does.
    posterior_wn_layers: int = 16
    flow_n_flows: int = 4

    def __post_init__(self):
        # JSON/YAML gives lists; normalize to tuples so the config is hashable
        # (a hashable config can be a static jit argument).
        for name in (
            "resblock_kernel_sizes",
            "upsample_rates",
            "upsample_kernel_sizes",
        ):
            v = getattr(self, name)
            if isinstance(v, list):
                object.__setattr__(self, name, tuple(v))
        v = self.resblock_dilation_sizes
        if isinstance(v, (list, tuple)) and v and isinstance(v[0], list):
            object.__setattr__(
                self, "resblock_dilation_sizes", tuple(tuple(x) for x in v)
            )


@dataclass(frozen=True)
class VITS2TrainConfig:
    """Training hyperparameters (vits2 JSON `train` section + cli.py defaults)."""

    seed: int = 1234
    learning_rate: float = 2e-4
    betas: Tuple[float, float] = (0.8, 0.99)
    eps: float = 1e-9
    lr_decay: float = 0.999875  # per-epoch exponential decay
    batch_size: int = 8
    segment_size: int = 8192
    c_mel: float = 45.0
    c_kl: float = 1.0
    # cli.py-only coefficients (vits2/cli.py:154-156), used by the
    # "lightning" step: G loss = (gen + c_fm*fm + c_dur*dur + c_kl*kl +
    # c_mel*mel) / (1 + c_fm + c_dur + c_kl + c_mel). The "ddp" step ignores
    # them (train.py weights fm and dur at 1 with no normalization).
    c_fm: float = 0.2
    c_dur: float = 1.0
    # bf16 compute / fp32 params+losses (the TPU analogue of the reference's
    # AMP, vits2/train.py:255,331 — no loss scaling needed on TPU)
    use_bf16: bool = False
    # failure detection (SURVEY.md §5, beyond the reference): fold a
    # skip-on-non-finite-loss select into the jitted step so training never
    # host-syncs on the loss value
    skip_nonfinite: bool = True
    # GAN step: "ddp" = reference train.py (D updates first, G sees the
    # updated D — costs a second generator forward; losses summed over
    # sub-discriminators, G loss = gen + fm + c_mel*mel + dur + c_kl*kl);
    # "lightning" = reference cli.py (G updates against the current D, then D
    # updates on the detached audio — one generator forward, ~25% faster;
    # losses MEANed over sub-discriminators and the G loss normalized by the
    # coefficient sum, cli.py:312-356). Full cli.py parity: ordering AND
    # weighting. Note cli.py's own coefficient defaults differ from
    # train.py's (c_mel 10 vs 45, c_kl 0.2 vs 1) — set them in the YAML when
    # training with the lightning recipe.
    step_order: str = "ddp"
    epochs: int = 20000
    log_interval: int = 200
    eval_interval: int = 1000
    keep_ckpts: int = 3
    # gradient accumulation over k micro-batches per real optimizer update
    # (reference `accumulate_grad`, vits2/cli.py:190,255-262,338-356): grads
    # are averaged across the window at frozen params via optax.MultiSteps
    # wrapped around every optimizer (G / D / duration disc) — see
    # vits2_train.make_optimizer. Effective batch = batch_size * grad_accum.
    grad_accum: int = 1

    def __post_init__(self):
        if isinstance(self.betas, list):
            object.__setattr__(self, "betas", tuple(self.betas))


@dataclass(frozen=True)
class DataConfig:
    """Dataset/text parameters (vits2/data_utils.py DataConfig:18-36)."""

    training_files: str = ""
    validation_files: str = ""
    text_cleaners: Tuple[str, ...] = ("basic_cleaners",)
    add_blank: bool = True
    min_text_len: int = 1
    max_text_len: int = 190
    n_speakers: int = 0
    cleaned_text: bool = False

    def __post_init__(self):
        if isinstance(self.text_cleaners, list):
            object.__setattr__(self, "text_cleaners", tuple(self.text_cleaners))


@dataclass(frozen=True)
class VITS2Config:
    audio: AudioConfig = field(default_factory=AudioConfig)
    model: VITS2ModelConfig = field(default_factory=VITS2ModelConfig)
    train: VITS2TrainConfig = field(default_factory=VITS2TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)

    @property
    def posterior_channels(self) -> int:
        """Mel posterior (VITS2) vs linear-spectrogram posterior (VITS1),
        mirroring the switch in vits2/train.py:73-83."""
        if self.model.use_mel_posterior_encoder:
            return self.audio.n_mel_channels
        return self.audio.filter_length // 2 + 1

    @property
    def segment_frames(self) -> int:
        return self.model.segment_size // self.audio.hop_length


def load_vits2_config(path: str) -> VITS2Config:
    """Load our YAML config or a reference-format vits2 JSON/YAML config."""
    text = open(path).read()
    if path.endswith(".json"):
        raw = json.loads(text)
    else:
        import yaml

        raw = yaml.safe_load(text)

    cfg = VITS2Config()
    # Reference JSON layout: {train: {...}, data: {...}, model: {...}}
    # Reference Lightning YAML layout: {data: {config: {...}}, model: {config: {...}}}
    if "model" in raw and isinstance(raw["model"], dict):
        model_d = raw["model"].get("config", raw["model"])
        cfg = dataclasses.replace(cfg, model=_apply(cfg.model, model_d))
        cfg = dataclasses.replace(cfg, audio=_apply(cfg.audio, model_d))
        # the reference's Lightning ModelConfig carries training knobs too —
        # map the ones our TrainConfig owns (cli.py:190 accumulate_grad)
        if "accumulate_grad" in model_d:
            cfg = dataclasses.replace(
                cfg,
                train=dataclasses.replace(
                    cfg.train, grad_accum=int(model_d["accumulate_grad"])
                ),
            )
    if "data" in raw and isinstance(raw["data"], dict):
        data_d = raw["data"].get("config", raw["data"])
        cfg = dataclasses.replace(cfg, data=_apply(cfg.data, data_d))
        cfg = dataclasses.replace(cfg, audio=_apply(cfg.audio, data_d))
    if "train" in raw and isinstance(raw["train"], dict):
        cfg = dataclasses.replace(cfg, train=_apply(cfg.train, raw["train"]))
    return cfg


# ---------------------------------------------------------------------------
# Tacotron configs (reference: configs/config-ljspeech.yaml + tacotron/data/audio.py:8)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TacotronAudioConfig:
    sample_rate: int = 22050
    hop_length: int = 256
    win_length: int = 1024
    num_mels: int = 80
    fmin: float = 50.0
    fmax: float = 7600.0


@dataclass(frozen=True)
class TacotronTextConfig:
    alphabet: str = "#abcdefghijklmnopqrstuvwxyz -:;,.!?()\"'"
    character_map: Tuple[Tuple[str, str], ...] = ()
    bos_symbols: str = ""
    eos_symbols: str = "#"

    def __post_init__(self):
        if isinstance(self.character_map, list):
            object.__setattr__(
                self, "character_map", tuple(tuple(x) for x in self.character_map)
            )


@dataclass(frozen=True)
class TacotronModelConfig:
    encoder_type: str = "tacotron2"
    dim_emb: int = 512
    dim_out: int = 512
    decoder_type: str = "tacotron2prod"
    r: int = 1
    dim_pre: int = 256
    dim_att: int = 1024
    dim_rnn: Tuple[int, int] = (1024, 1024)
    postnet_type: Optional[str] = "tacotron2"
    postnet_dim_hidden: int = 512
    postnet_num_layers: int = 3
    style_dim_vae: Optional[int] = None  # set -> VAE reference encoder

    def __post_init__(self):
        if isinstance(self.dim_rnn, list):
            object.__setattr__(self, "dim_rnn", tuple(self.dim_rnn))


@dataclass(frozen=True)
class TacotronConfig:
    audio: TacotronAudioConfig = field(default_factory=TacotronAudioConfig)
    text: TacotronTextConfig = field(default_factory=TacotronTextConfig)
    model: TacotronModelConfig = field(default_factory=TacotronModelConfig)


def load_tacotron_config(path: str) -> TacotronConfig:
    """Load our config or the reference's tacotron YAML
    (configs/config-ljspeech.yaml structure)."""
    import yaml

    raw = yaml.safe_load(open(path).read())
    cfg = TacotronConfig()
    if "audio" in raw:
        cfg = dataclasses.replace(cfg, audio=_apply(cfg.audio, raw["audio"]))
    if "text" in raw:
        cfg = dataclasses.replace(cfg, text=_apply(cfg.text, raw["text"]))
    if "model" in raw:
        m = raw["model"]
        upd: dict = {}
        if "encoder" in m:
            upd.update(
                encoder_type=m["encoder"].get("type", "tacotron2"),
                dim_emb=m["encoder"].get("dim_emb", 512),
                dim_out=m["encoder"].get("dim_out", 512),
            )
        if "decoder" in m:
            d = m["decoder"]
            upd.update(
                decoder_type=d.get("type", "tacotron2prod"),
                r=d.get("r", 1),
                dim_pre=d.get("dim_pre", 256),
                dim_att=d.get("dim_att", 1024),
                dim_rnn=tuple(d.get("dim_rnn", (1024, 1024))),
            )
        if m.get("postnet"):
            p = m["postnet"]
            upd.update(
                postnet_type=p.get("type", "tacotron2"),
                postnet_dim_hidden=p.get("dim_hidden", 512),
                postnet_num_layers=p.get("num_layers", 3),
            )
        else:
            upd.update(postnet_type=None)
        if m.get("style_encoder"):
            upd.update(style_dim_vae=m["style_encoder"].get("dim_vae", 16))
        cfg = dataclasses.replace(cfg, model=_apply(cfg.model, upd))
    return cfg
