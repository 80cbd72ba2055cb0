"""VITS2 synthesizer (generator network).

TPU-native equivalent of /root/reference/vits2/models.py `SynthesizerTrn`
(:1113-1336) and its sub-networks, channels-last [B, T, C]:

- TextEncoder (:332)             — scaled embedding + rel-pos transformer + proj
- PosteriorEncoder (:858)        — 1x1 pre -> WN(16) -> (m, logs), reparam z
- flow bridge (:681-855)         — 4 coupling steps; plain VITS1 couplings or
                                   one of 5 VITS2 transformer-flow variants
- StochasticDurationPredictor (:29)  — spline-flow NLL / reverse sampling
- DurationPredictor (:140)       — conv regressor
- Generator                      — HiFi-GAN decoder (ops/hifigan.py)

Differences forced by XLA are confined to:
- MAS runs on device (kernels/mas.py) instead of the host Cython round-trip;
- inference output length is bucketed: `infer` takes a static `max_frames`
  and returns (audio, y_lengths) with a mask instead of dynamically-sized
  tensors (models.py:1304-1311's data-dependent length);
- randomness is explicit: the module draws from the 'noise' rng stream.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from torch_tts_tpu.core.config import VITS2ModelConfig
from torch_tts_tpu.core.masks import generate_path, rand_slice_segments, sequence_mask
from torch_tts_tpu.kernels.mas import maximum_path
from torch_tts_tpu.ops.convs import DDSConv
from torch_tts_tpu.ops.flows import ConvFlow, ElementwiseAffine, Flip, Log, ResidualCouplingLayer
from torch_tts_tpu.ops.hifigan import Generator
from torch_tts_tpu.ops.layers import Conv1d, Dropout, Embed, LayerNorm
from torch_tts_tpu.ops.transformer import FFT, Encoder
from torch_tts_tpu.ops.wavenet import WN

AVAILABLE_FLOW_TYPES = (
    "pre_conv",
    "pre_conv2",
    "fft",
    "mono_layer_inter_residual",
    "mono_layer_post_residual",
)


class TextEncoder(nn.Module):
    n_vocab: int
    out_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_lengths, g=None, deterministic: bool = True):
        h = self.hidden_channels
        emb = Embed(self.n_vocab, h, init_std=h**-0.5, name="emb")(x)
        emb = emb * math.sqrt(h)
        x_mask = sequence_mask(x_lengths, x.shape[1]).astype(emb.dtype)[..., None]
        hx = Encoder(
            h,
            self.filter_channels,
            self.n_heads,
            self.n_layers,
            self.kernel_size,
            self.p_dropout,
            gin_channels=self.gin_channels,
            name="encoder",
        )(emb * x_mask, x_mask, g=g, deterministic=deterministic)
        stats = Conv1d(self.out_channels * 2, 1, name="proj")(hx) * x_mask
        m, logs = stats[..., : self.out_channels], stats[..., self.out_channels :]
        return hx, m, logs, x_mask


class PosteriorEncoder(nn.Module):
    out_channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0

    @nn.compact
    def __call__(self, y, y_lengths, g=None, deterministic: bool = True):
        y_mask = sequence_mask(y_lengths, y.shape[1]).astype(y.dtype)[..., None]
        h = Conv1d(self.hidden_channels, 1, name="pre")(y) * y_mask
        h = WN(
            self.hidden_channels,
            self.kernel_size,
            self.dilation_rate,
            self.n_layers,
            gin_channels=self.gin_channels,
            name="enc",
        )(h, y_mask, g=g, deterministic=deterministic)
        stats = Conv1d(self.out_channels * 2, 1, name="proj")(h) * y_mask
        m, logs = stats[..., : self.out_channels], stats[..., self.out_channels :]
        eps = jax.random.normal(self.make_rng("noise"), m.shape, m.dtype)
        z = (m + eps * jnp.exp(logs)) * y_mask
        return z, m, logs, y_mask


# ---------------------------------------------------------------------------
# VITS2 transformer-flow coupling variants (models.py:383-678)
# ---------------------------------------------------------------------------


class ResidualCouplingTransformersLayer(nn.Module):
    """`pre_conv`: transformer on x0 before the WN conditioner (models.py:450)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    p_dropout: float = 0.0
    gin_channels: int = 0
    mean_only: bool = True

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False, deterministic: bool = True):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        x0_ = Encoder(
            half, half, n_heads=2, n_layers=2, kernel_size=3, p_dropout=0.1,
            window_size=None, name="pre_transformer",
        )(x0 * x_mask, x_mask, deterministic=deterministic)
        x0_ = x0_ + x0
        h = Conv1d(self.hidden_channels, 1, name="pre")(x0_) * x_mask
        h = WN(
            self.hidden_channels,
            self.kernel_size,
            self.dilation_rate,
            self.n_layers,
            p_dropout=self.p_dropout,
            gin_channels=self.gin_channels,
            name="enc",
        )(h, x_mask, g=g, deterministic=deterministic)
        stats = Conv1d(half * (2 - self.mean_only), 1, zero_init=True, name="post")(h) * x_mask
        if not self.mean_only:
            m, logs = stats[..., :half], stats[..., half:]
        else:
            m, logs = stats, jnp.zeros_like(stats)
        if not reverse:
            x1 = (m + x1 * jnp.exp(logs)) * x_mask
            return jnp.concatenate([x0, x1], -1), jnp.sum(logs, (1, 2))
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], -1)


class ResidualCouplingTransformersLayer2(nn.Module):
    """`pre_conv2`: transformer residual on the hidden stream (models.py:383)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    p_dropout: float = 0.0
    gin_channels: int = 0
    mean_only: bool = True

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False, deterministic: bool = True):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.hidden_channels, 1, name="pre")(x0) * x_mask
        h_t = Encoder(
            self.hidden_channels, self.hidden_channels, n_heads=2, n_layers=1,
            kernel_size=self.kernel_size, p_dropout=self.p_dropout,
            name="pre_transformer",
        )(h * x_mask, x_mask, deterministic=deterministic)
        h = h + h_t
        h = WN(
            self.hidden_channels,
            self.kernel_size,
            self.dilation_rate,
            self.n_layers,
            p_dropout=self.p_dropout,
            gin_channels=self.gin_channels,
            name="enc",
        )(h, x_mask, g=g, deterministic=deterministic)
        stats = Conv1d(half * (2 - self.mean_only), 1, zero_init=True, name="post")(h) * x_mask
        if not self.mean_only:
            m, logs = stats[..., :half], stats[..., half:]
        else:
            m, logs = stats, jnp.zeros_like(stats)
        if not reverse:
            x1 = (m + x1 * jnp.exp(logs)) * x_mask
            return jnp.concatenate([x0, x1], -1), jnp.sum(logs, (1, 2))
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], -1)


class FFTransformerCouplingLayer(nn.Module):
    """`fft`: causal FFT-block conditioner (models.py:534)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    n_layers: int
    n_heads: int = 2
    p_dropout: float = 0.0
    filter_channels: int = 768
    gin_channels: int = 0
    mean_only: bool = True

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False, deterministic: bool = True):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.hidden_channels, 1, name="pre")(x0) * x_mask
        h_ = FFT(
            self.hidden_channels,
            self.filter_channels,
            self.n_heads,
            self.n_layers,
            self.kernel_size,
            self.p_dropout,
            gin_channels=self.gin_channels,
            name="enc",
        )(h, x_mask, g=g, deterministic=deterministic)
        h = h_ + h
        stats = Conv1d(half * (2 - self.mean_only), 1, zero_init=True, name="post")(h) * x_mask
        if not self.mean_only:
            m, logs = stats[..., :half], stats[..., half:]
        else:
            m, logs = stats, jnp.zeros_like(stats)
        if not reverse:
            x1 = (m + x1 * jnp.exp(logs)) * x_mask
            return jnp.concatenate([x0, x1], -1), jnp.sum(logs, (1, 2))
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], -1)


class MonoTransformerFlowLayer(nn.Module):
    """Mono-layer transformer flow (models.py:594), with optional VITS2 fig-1B
    residual connection. Only instantiated mean_only=True (as in the
    reference), for which the residual inverse is exact."""

    channels: int
    hidden_channels: int
    mean_only: bool = True
    residual_connection: bool = False

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False, deterministic: bool = True):
        half = self.channels // 2
        pre_tf = Encoder(
            half, half, n_heads=2, n_layers=2, kernel_size=3, p_dropout=0.1,
            window_size=None, name="pre_transformer",
        )
        post = Conv1d(half * (2 - self.mean_only), 1, zero_init=True, name="post")

        def stats_of(x0_in):
            stats = post(x0_in) * x_mask
            if not self.mean_only:
                return stats[..., :half], stats[..., half:]
            return stats, jnp.zeros_like(stats)

        if self.residual_connection:
            if not reverse:
                x0, x1 = x[..., :half], x[..., half:]
                x0_ = pre_tf(x0, x_mask, deterministic=deterministic)
                m, logs = stats_of(x0_)
                x1_new = (m + x1 * jnp.exp(logs)) * x_mask
                y = x + jnp.concatenate([x0, x1_new], -1)
                logdet = jnp.sum(jnp.log(jnp.exp(logs) + 1), (1, 2))
                logdet = logdet + math.log(2.0) * (half * x.shape[1])
                return y, logdet
            x0, x1 = x[..., :half], x[..., half:]
            x0 = x0 / 2
            x0_ = pre_tf(x0, x_mask, deterministic=deterministic)
            m, logs = stats_of(x0_)
            # inverse of x1' = m + x1*(1 + e^logs); equals the reference's
            # expression when logs == 0 (mean_only), which is the only case used
            x1 = (x1 - m) / (1 + jnp.exp(logs)) * x_mask
            return jnp.concatenate([x0, x1], -1)

        x0, x1 = x[..., :half], x[..., half:]
        x0_ = pre_tf(x0 * x_mask, x_mask, deterministic=deterministic)
        h = x0_ + x0
        m, logs = stats_of(h)
        if not reverse:
            x1 = (m + x1 * jnp.exp(logs)) * x_mask
            return jnp.concatenate([x0, x1], -1), jnp.sum(logs, (1, 2))
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], -1)


class FlowBlock(nn.Module):
    """Flow bridge: n_flows coupling steps (+flips), VITS1 or VITS2 style
    (models.py:681-855)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    n_flows: int = 4
    gin_channels: int = 0
    use_transformer_flows: bool = False
    transformer_flow_type: str = "pre_conv"

    def setup(self):
        flows = []
        if self.use_transformer_flows:
            t = self.transformer_flow_type
            assert t in AVAILABLE_FLOW_TYPES, t
            for i in range(self.n_flows):
                if t == "pre_conv":
                    flows.append(
                        ResidualCouplingTransformersLayer(
                            self.channels, self.hidden_channels, self.kernel_size,
                            self.dilation_rate, self.n_layers,
                            gin_channels=self.gin_channels, mean_only=True,
                        )
                    )
                    flows.append(Flip())
                elif t == "pre_conv2":
                    flows.append(
                        ResidualCouplingTransformersLayer2(
                            self.channels, self.hidden_channels, self.kernel_size,
                            self.dilation_rate, self.n_layers,
                            gin_channels=self.gin_channels, mean_only=True,
                        )
                    )
                    flows.append(Flip())
                elif t == "fft":
                    # the reference passes (dilation_rate, n_layers) positionally
                    # into (n_layers, n_heads) (models.py:736-745); mirror the
                    # effective instantiation: 1 FFT layer, n_layers heads
                    flows.append(
                        FFTransformerCouplingLayer(
                            self.channels, self.hidden_channels, self.kernel_size,
                            n_layers=self.dilation_rate, n_heads=self.n_layers,
                            gin_channels=self.gin_channels, mean_only=True,
                        )
                    )
                    flows.append(Flip())
                elif t == "mono_layer_inter_residual":
                    flows.append(
                        ResidualCouplingLayer(
                            self.channels, self.hidden_channels, self.kernel_size,
                            self.dilation_rate, self.n_layers,
                            gin_channels=self.gin_channels, mean_only=True,
                        )
                    )
                    flows.append(Flip())
                    flows.append(
                        MonoTransformerFlowLayer(
                            self.channels, self.hidden_channels, mean_only=True
                        )
                    )
                elif t == "mono_layer_post_residual":
                    flows.append(
                        ResidualCouplingLayer(
                            self.channels, self.hidden_channels, self.kernel_size,
                            self.dilation_rate, self.n_layers,
                            gin_channels=self.gin_channels, mean_only=True,
                        )
                    )
                    flows.append(Flip())
                    flows.append(
                        MonoTransformerFlowLayer(
                            self.channels, self.hidden_channels, mean_only=True,
                            residual_connection=True,
                        )
                    )
        else:
            for i in range(self.n_flows):
                flows.append(
                    ResidualCouplingLayer(
                        self.channels, self.hidden_channels, self.kernel_size,
                        self.dilation_rate, self.n_layers,
                        gin_channels=self.gin_channels, mean_only=True,
                    )
                )
                flows.append(Flip())
        self.flows = flows

    def __call__(self, x, x_mask, g=None, reverse: bool = False, deterministic: bool = True):
        if not reverse:
            for flow in self.flows:
                x, _ = flow(x, x_mask, g=g, reverse=False, deterministic=deterministic)
            return x
        for flow in reversed(self.flows):
            x = flow(x, x_mask, g=g, reverse=True, deterministic=deterministic)
        return x


# ---------------------------------------------------------------------------
# Duration predictors (models.py:29-180)
# ---------------------------------------------------------------------------


class StochasticDurationPredictor(nn.Module):
    in_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float
    n_flows: int = 4
    gin_channels: int = 0

    def setup(self):
        fc = self.in_channels  # reference overrides filter_channels (models.py:40)
        self.log_flow = Log()
        flows = [ElementwiseAffine(2)]
        for _ in range(self.n_flows):
            flows.append(ConvFlow(2, fc, self.kernel_size, n_layers=3))
            flows.append(Flip())
        self.flows = flows

        self.post_pre = Conv1d(fc, 1)
        self.post_proj = Conv1d(fc, 1)
        self.post_convs = DDSConv(fc, self.kernel_size, n_layers=3, p_dropout=self.p_dropout)
        post_flows = [ElementwiseAffine(2)]
        for _ in range(4):
            post_flows.append(ConvFlow(2, fc, self.kernel_size, n_layers=3))
            post_flows.append(Flip())
        self.post_flows = post_flows

        self.pre = Conv1d(fc, 1)
        self.proj = Conv1d(fc, 1)
        self.convs = DDSConv(fc, self.kernel_size, n_layers=3, p_dropout=self.p_dropout)
        if self.gin_channels != 0:
            self.cond = Conv1d(fc, 1)

    def __call__(
        self,
        x,
        x_mask,
        w=None,
        g=None,
        reverse: bool = False,
        noise_scale: float = 1.0,
        deterministic: bool = True,
    ):
        x = jax.lax.stop_gradient(x)
        x = self.pre(x)
        if g is not None:
            g = jax.lax.stop_gradient(g)
            x = x + self.cond(g)
        x = self.convs(x, x_mask, deterministic=deterministic)
        x = self.proj(x) * x_mask

        if not reverse:
            assert w is not None
            logdet_tot_q = 0.0
            h_w = self.post_pre(w)
            h_w = self.post_convs(h_w, x_mask, deterministic=deterministic)
            h_w = self.post_proj(h_w) * x_mask
            e_q = (
                jax.random.normal(self.make_rng("noise"), (w.shape[0], w.shape[1], 2), x.dtype)
                * x_mask
            )
            z_q = e_q
            for flow in self.post_flows:
                z_q, logdet_q = flow(z_q, x_mask, g=(x + h_w), deterministic=deterministic)
                logdet_tot_q += logdet_q
            z_u, z1 = z_q[..., 0:1], z_q[..., 1:2]
            u = jax.nn.sigmoid(z_u) * x_mask
            z0 = (w - u) * x_mask
            logdet_tot_q += jnp.sum(
                (jax.nn.log_sigmoid(z_u) + jax.nn.log_sigmoid(-z_u)) * x_mask, (1, 2)
            )
            logq = (
                jnp.sum(-0.5 * (math.log(2 * math.pi) + e_q**2) * x_mask, (1, 2))
                - logdet_tot_q
            )

            logdet_tot = 0.0
            z0, logdet = self.log_flow(z0, x_mask)
            logdet_tot += logdet
            z = jnp.concatenate([z0, z1], -1)
            for flow in self.flows:
                z, logdet = flow(z, x_mask, g=x, reverse=False, deterministic=deterministic)
                logdet_tot = logdet_tot + logdet
            nll = (
                jnp.sum(0.5 * (math.log(2 * math.pi) + z**2) * x_mask, (1, 2))
                - logdet_tot
            )
            return nll + logq  # [B]

        # reverse: sample log-durations
        flows = list(reversed(self.flows))
        flows = flows[:-2] + [flows[-1]]  # drop the vestigial extra flow
        z = (
            jax.random.normal(self.make_rng("noise"), (x.shape[0], x.shape[1], 2), x.dtype)
            * noise_scale
        )
        for flow in flows:
            z = flow(z, x_mask, g=x, reverse=True, deterministic=deterministic)
        logw = z[..., 0:1]
        return logw


class DurationPredictor(nn.Module):
    filter_channels: int
    kernel_size: int
    p_dropout: float
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask, g=None, deterministic: bool = True):
        x = jax.lax.stop_gradient(x)
        if g is not None:
            g = jax.lax.stop_gradient(g)
            x = x + Conv1d(x.shape[-1], 1, name="cond")(g)
        drop = Dropout(self.p_dropout)
        x = Conv1d(self.filter_channels, self.kernel_size,
                   padding=self.kernel_size // 2, name="conv_1")(x * x_mask)
        x = drop(LayerNorm(name="norm_1")(jax.nn.relu(x)), deterministic)
        x = Conv1d(self.filter_channels, self.kernel_size,
                   padding=self.kernel_size // 2, name="conv_2")(x * x_mask)
        x = drop(LayerNorm(name="norm_2")(jax.nn.relu(x)), deterministic)
        x = Conv1d(1, 1, name="proj")(x * x_mask)
        return x * x_mask


# ---------------------------------------------------------------------------
# SynthesizerTrn
# ---------------------------------------------------------------------------


class SynthesizerTrn(nn.Module):
    """Full VITS2 generator; apply with method='infer' / 'voice_conversion'
    for the non-training paths."""

    n_vocab: int
    spec_channels: int
    segment_frames: int  # segment_size // hop_length
    cfg: VITS2ModelConfig

    def setup(self):
        c = self.cfg
        enc_gin = c.gin_channels if (c.use_spk_conditioned_encoder and c.gin_channels > 0) else 0
        self.enc_p = TextEncoder(
            self.n_vocab,
            c.inter_channels,
            c.hidden_channels,
            c.filter_channels,
            c.n_heads,
            c.n_layers,
            c.kernel_size,
            c.p_dropout,
            gin_channels=enc_gin,
        )
        if getattr(c, "decoder_type", "hifigan") == "mb_istft":
            from torch_tts_tpu.ops.mb_istft import MultiBandISTFTGenerator

            self.dec = MultiBandISTFTGenerator(
                resblock=c.resblock,
                resblock_kernel_sizes=tuple(c.resblock_kernel_sizes),
                resblock_dilation_sizes=tuple(map(tuple, c.resblock_dilation_sizes)),
                upsample_rates=tuple(c.upsample_rates),
                upsample_initial_channel=c.upsample_initial_channel,
                upsample_kernel_sizes=tuple(c.upsample_kernel_sizes),
                subbands=c.subbands,
                istft_n_fft=c.gen_istft_n_fft,
                istft_hop=c.gen_istft_hop_size,
                gin_channels=c.gin_channels,
                quant_int8=getattr(c, "quantize_decoder", False),
            )
        else:
            self.dec = Generator(
                resblock=c.resblock,
                resblock_kernel_sizes=tuple(c.resblock_kernel_sizes),
                resblock_dilation_sizes=tuple(map(tuple, c.resblock_dilation_sizes)),
                upsample_rates=tuple(c.upsample_rates),
                upsample_initial_channel=c.upsample_initial_channel,
                upsample_kernel_sizes=tuple(c.upsample_kernel_sizes),
                gin_channels=c.gin_channels,
                pack_narrow=getattr(c, "pack_narrow_convs", False),
                quant_int8=getattr(c, "quantize_decoder", False),
                fuse_mrf=getattr(c, "fuse_mrf", False),
            )
        self.enc_q = PosteriorEncoder(
            c.inter_channels, c.hidden_channels, 5, 1,
            getattr(c, "posterior_wn_layers", 16), gin_channels=c.gin_channels
        )
        self.flow = FlowBlock(
            c.inter_channels,
            c.hidden_channels,
            5,
            1,
            4,
            n_flows=getattr(c, "flow_n_flows", 4),
            gin_channels=c.gin_channels,
            use_transformer_flows=c.use_transformer_flows,
            transformer_flow_type=c.transformer_flow_type,
        )
        if c.use_sdp:
            self.dp = StochasticDurationPredictor(
                c.hidden_channels, 192, 3, c.dp_dropout, 4,
                gin_channels=c.gin_channels,
            )
        else:
            self.dp = DurationPredictor(
                256, 3, c.dp_dropout, gin_channels=c.gin_channels
            )
        if c.n_speakers > 1:
            self.emb_g = Embed(c.n_speakers, c.gin_channels)

    def _speaker(self, sid):
        if sid is None or self.cfg.n_speakers <= 1:
            return None
        return self.emb_g(sid)[:, None, :]  # [B, 1, gin]

    def __call__(
        self,
        x,
        x_lengths,
        y,
        y_lengths,
        sid=None,
        mas_noise_scale: Optional[jax.Array] = None,
        deterministic: bool = False,
    ):
        """Training forward (models.py:1214-1286). y: [B, T_spec, spec_channels]."""
        c = self.cfg
        g = self._speaker(sid)
        hx, m_p, logs_p, x_mask = self.enc_p(x, x_lengths, g=g, deterministic=deterministic)
        z, m_q, logs_q, y_mask = self.enc_q(y, y_lengths, g=g, deterministic=deterministic)
        z_p = self.flow(z, y_mask, g=g, deterministic=deterministic)

        # --- MAS (no-grad) ---
        zp_ng = jax.lax.stop_gradient(z_p)
        mp_ng = jax.lax.stop_gradient(m_p)
        lp_ng = jax.lax.stop_gradient(logs_p)
        s_p_sq_r = jnp.exp(-2 * lp_ng)  # [B, T_x, D]
        neg_cent1 = jnp.sum(-0.5 * math.log(2 * math.pi) - lp_ng, -1)  # [B, T_x]
        neg_cent2 = jnp.einsum("btd,bxd->btx", -0.5 * zp_ng**2, s_p_sq_r)
        neg_cent3 = jnp.einsum("btd,bxd->btx", zp_ng, mp_ng * s_p_sq_r)
        neg_cent4 = jnp.sum(-0.5 * mp_ng**2 * s_p_sq_r, -1)  # [B, T_x]
        neg_cent = neg_cent2 + neg_cent3 + neg_cent1[:, None, :] + neg_cent4[:, None, :]

        if mas_noise_scale is not None:
            eps = (
                jnp.std(neg_cent)
                * jax.random.normal(self.make_rng("noise"), neg_cent.shape, neg_cent.dtype)
                * mas_noise_scale
            )
            neg_cent = neg_cent + eps

        attn_mask = y_mask * jnp.swapaxes(x_mask, 1, 2)  # [B, T_y, T_x]
        attn = jax.lax.stop_gradient(maximum_path(neg_cent, attn_mask))

        w = jnp.sum(attn, axis=1, keepdims=True)  # [B, 1, T_x]
        w = jnp.swapaxes(w, 1, 2)  # [B, T_x, 1]
        if c.use_sdp:
            l_length = self.dp(hx, x_mask, w=w, g=g, deterministic=deterministic)
            l_length = l_length / jnp.sum(x_mask)
            logw = self.dp(
                hx, x_mask, g=g, reverse=True, noise_scale=1.0, deterministic=deterministic
            )
            logw_ = jnp.log(w + 1e-6) * x_mask
        else:
            logw_ = jnp.log(w + 1e-6) * x_mask
            logw = self.dp(hx, x_mask, g=g, deterministic=deterministic)
            l_length = jnp.sum((logw - logw_) ** 2, (1, 2)) / jnp.sum(x_mask)

        # expand prior over frames: [B, T_y, T_x] @ [B, T_x, D]
        m_p_e = jnp.einsum("btx,bxd->btd", attn, m_p)
        logs_p_e = jnp.einsum("btx,bxd->btd", attn, logs_p)

        z_slice, ids_slice = rand_slice_segments(
            self.make_rng("noise"), z, y_lengths, self.segment_frames
        )
        o = self.dec(z_slice, g=g)
        return (
            o,
            l_length,
            attn,
            ids_slice,
            x_mask,
            y_mask,
            (z, z_p, m_p_e, logs_p_e, m_q, logs_q),
            (hx, logw, logw_),
        )

    def infer(
        self,
        x,
        x_lengths,
        sid=None,
        noise_scale: float = 1.0,
        length_scale: float = 1.0,
        noise_scale_w: float = 1.0,
        max_frames: int = 1000,
        deterministic: bool = True,
    ):
        """Inference (models.py:1288-1323) with bucketed static output length.

        Returns (audio [B, max_frames*hop, 1], attn, y_mask, aux, y_lengths).
        """
        c = self.cfg
        g = self._speaker(sid)
        hx, m_p, logs_p, x_mask = self.enc_p(x, x_lengths, g=g, deterministic=deterministic)
        if c.use_sdp:
            logw = self.dp(
                hx, x_mask, g=g, reverse=True, noise_scale=noise_scale_w,
                deterministic=deterministic,
            )
        else:
            logw = self.dp(hx, x_mask, g=g, deterministic=deterministic)
        w = jnp.exp(logw) * x_mask * length_scale
        w_ceil = jnp.ceil(w)  # [B, T_x, 1]
        y_lengths = jnp.maximum(jnp.sum(w_ceil, (1, 2)), 1.0).astype(jnp.int32)
        y_lengths = jnp.minimum(y_lengths, max_frames)
        y_mask = sequence_mask(y_lengths, max_frames).astype(x_mask.dtype)[..., None]
        attn = generate_path(w_ceil[..., 0], max_frames)  # [B, T_y, T_x]
        attn = attn * (y_mask * jnp.swapaxes(x_mask, 1, 2))

        m_p_e = jnp.einsum("btx,bxd->btd", attn, m_p)
        logs_p_e = jnp.einsum("btx,bxd->btd", attn, logs_p)
        eps = jax.random.normal(self.make_rng("noise"), m_p_e.shape, m_p_e.dtype)
        z_p = m_p_e + eps * jnp.exp(logs_p_e) * noise_scale
        z = self.flow(z_p, y_mask, g=g, reverse=True, deterministic=deterministic)
        o = self._decode_padded(z * y_mask, y_mask, y_lengths, max_frames, g=g)
        return o, attn, y_mask, (z, z_p, m_p_e, logs_p_e), y_lengths

    _PATCH_WINDOW = 128  # frames; >= 2x the decoder receptive-field half-width

    def _decode_padded(self, zm, y_mask, y_lengths, max_frames, g=None):
        """Decode padded latents with exact-length semantics, cheaply.

        The reference decodes an exact-length sequence (models.py:1322), so
        its convs see SAME-padding zeros beyond y_length. On TPU the batch is
        padded to max_frames; threading a per-layer mask through the decoder
        reproduces the reference bit-for-bit but was measured to DOUBLE the
        decoder's cost (24.5 vs 12.0 ms at 1024 frames — masking breaks the
        conv fusion chains). Instead:

        1. decode the full padded latents UNMASKED — every output more than
           the receptive field before y_length is unaffected by the padded
           tail (same clamped-window argument as infer/streaming.py),
        2. re-decode one small fixed window ending at y_length WITH the
           per-layer mask, and paste its last W/2 frames over the bulk
           output (per-item dynamic slices; one executable),
        3. zero the tail at sample level. NOTE the fully-masked decode's
           tail is NOT quite zero — the final mask multiply happens before
           conv_post (k=7), so its first 3 tail samples carry bleed from
           valid taps; exact-length semantics zero them (the reference's
           unpadded decode has no such samples at all).

        Valid-region output is numerically identical to the fully-masked
        decode and the tail is all-zero regardless of which branch runs
        (tested); cost is dec_unmasked + dec(window) ~= 12 + 3 ms instead
        of 24.5 ms.
        """
        T = max_frames
        W = self._PATCH_WINDOW
        if T <= W:
            o = self.dec(zm, g=g, x_mask=y_mask)
            # same sample-level tail zeroing as the patch path below: the
            # masked decode still bleeds (k-1)/2 conv_post samples past
            # y_length (mask is applied before conv_post, not after), and
            # exact-length semantics must not depend on max_frames.
            f = o.shape[1] // T
            return o * jnp.repeat(y_mask, f, axis=1)
        keep = W // 2
        o_bulk = self.dec(zm, g=g)
        f = o_bulk.shape[1] // T  # samples per latent frame

        starts = jnp.clip(y_lengths - W, 0, T - W)  # [B]
        zwin = jax.vmap(
            lambda zz, s: jax.lax.dynamic_slice_in_dim(zz, s, W, 0)
        )(zm, starts)
        win_valid = y_lengths - starts  # <= W
        win_mask = (
            jnp.arange(W)[None, :] < win_valid[:, None]
        ).astype(zm.dtype)[..., None]
        o_win = self.dec(zwin * win_mask, g=g, x_mask=win_mask)

        paste_start = jnp.clip(y_lengths - keep, 0, T - keep)  # frames
        src_off = paste_start - starts  # in [0, W - keep]
        o_keep = jax.vmap(
            lambda ow, so: jax.lax.dynamic_slice_in_dim(ow, so * f, keep * f, 0)
        )(o_win, src_off)
        o = jax.vmap(
            lambda ob, ps, ok: jax.lax.dynamic_update_slice_in_dim(
                ob, ok, ps * f, 0
            )
        )(o_bulk, paste_start, o_keep)
        sample_mask = jnp.repeat(y_mask, f, axis=1)
        return o * sample_mask

    def infer_latents(
        self,
        x,
        x_lengths,
        sid=None,
        noise_scale: float = 1.0,
        length_scale: float = 1.0,
        noise_scale_w: float = 1.0,
        max_frames: int = 1000,
        deterministic: bool = True,
    ):
        """`infer` up to (but not including) the decoder — for streaming
        synthesis (infer/streaming.py): the cheap text->latent prefix runs
        once, then the decoder streams chunk by chunk. Returns
        (z*y_mask [B, max_frames, C], g or None, y_mask, y_lengths);
        `dec(z*y_mask, g=g)` reproduces `infer`'s audio exactly.
        No reference counterpart (the reference is monolithic,
        vits2/inference.py:50-60)."""
        c = self.cfg
        g = self._speaker(sid)
        hx, m_p, logs_p, x_mask = self.enc_p(x, x_lengths, g=g, deterministic=deterministic)
        if c.use_sdp:
            logw = self.dp(
                hx, x_mask, g=g, reverse=True, noise_scale=noise_scale_w,
                deterministic=deterministic,
            )
        else:
            logw = self.dp(hx, x_mask, g=g, deterministic=deterministic)
        w = jnp.exp(logw) * x_mask * length_scale
        w_ceil = jnp.ceil(w)
        y_lengths = jnp.maximum(jnp.sum(w_ceil, (1, 2)), 1.0).astype(jnp.int32)
        y_lengths = jnp.minimum(y_lengths, max_frames)
        y_mask = sequence_mask(y_lengths, max_frames).astype(x_mask.dtype)[..., None]
        attn = generate_path(w_ceil[..., 0], max_frames)
        attn = attn * (y_mask * jnp.swapaxes(x_mask, 1, 2))
        m_p_e = jnp.einsum("btx,bxd->btd", attn, m_p)
        logs_p_e = jnp.einsum("btx,bxd->btd", attn, logs_p)
        eps = jax.random.normal(self.make_rng("noise"), m_p_e.shape, m_p_e.dtype)
        z_p = m_p_e + eps * jnp.exp(logs_p_e) * noise_scale
        z = self.flow(z_p, y_mask, g=g, reverse=True, deterministic=deterministic)
        return z * y_mask, g, y_mask, y_lengths

    def infer_pre_flow(
        self,
        x,
        x_lengths,
        sid=None,
        noise_scale: float = 1.0,
        length_scale: float = 1.0,
        noise_scale_w: float = 1.0,
        max_frames: int = 1000,
        deterministic: bool = True,
    ):
        """`infer` up to (but not including) the flow reverse — for streaming
        the flow+decoder jointly (infer/streaming.StreamingFlowDecoder) when
        the flow stack is conv-local (plain couplings,
        use_transformer_flows=False). Returns (z_p, g, y_mask, y_lengths);
        `dec(flow(z_p, y_mask, reverse=True) * y_mask, g=g)` reproduces
        `infer`'s audio exactly. No reference counterpart."""
        c = self.cfg
        g = self._speaker(sid)
        hx, m_p, logs_p, x_mask = self.enc_p(x, x_lengths, g=g, deterministic=deterministic)
        if c.use_sdp:
            logw = self.dp(
                hx, x_mask, g=g, reverse=True, noise_scale=noise_scale_w,
                deterministic=deterministic,
            )
        else:
            logw = self.dp(hx, x_mask, g=g, deterministic=deterministic)
        w = jnp.exp(logw) * x_mask * length_scale
        w_ceil = jnp.ceil(w)
        y_lengths = jnp.maximum(jnp.sum(w_ceil, (1, 2)), 1.0).astype(jnp.int32)
        y_lengths = jnp.minimum(y_lengths, max_frames)
        y_mask = sequence_mask(y_lengths, max_frames).astype(x_mask.dtype)[..., None]
        attn = generate_path(w_ceil[..., 0], max_frames)
        attn = attn * (y_mask * jnp.swapaxes(x_mask, 1, 2))
        m_p_e = jnp.einsum("btx,bxd->btd", attn, m_p)
        logs_p_e = jnp.einsum("btx,bxd->btd", attn, logs_p)
        eps = jax.random.normal(self.make_rng("noise"), m_p_e.shape, m_p_e.dtype)
        z_p = m_p_e + eps * jnp.exp(logs_p_e) * noise_scale
        return z_p, g, y_mask, y_lengths

    def voice_conversion(self, y, y_lengths, sid_src, sid_tgt, deterministic: bool = True):
        """Flow round-trip speaker swap (models.py:1328-1336)."""
        assert self.cfg.n_speakers > 1, "voice conversion needs a multi-speaker model"
        g_src = self.emb_g(sid_src)[:, None, :]
        g_tgt = self.emb_g(sid_tgt)[:, None, :]
        z, m_q, logs_q, y_mask = self.enc_q(y, y_lengths, g=g_src, deterministic=deterministic)
        z_p = self.flow(z, y_mask, g=g_src, deterministic=deterministic)
        z_hat = self.flow(z_p, y_mask, g=g_tgt, reverse=True, deterministic=deterministic)
        o_hat = self.dec(z_hat * y_mask, g=g_tgt, x_mask=y_mask)
        return o_hat, y_mask, (z, z_p, z_hat)
