"""HiFi-GAN generator (the VITS decoder `dec`).

Equivalent of /root/reference/vits2/models.py:900-974 plus ResBlock1/2
(vits2/modules.py:221-360), channels-last. All weight-normed convs; the MRF
(multi-receptive-field) resblock outputs are averaged per upsample stage.

TPU notes: transposed convs lower to input-dilated convolutions; the whole
generator is a chain of conv ops over progressively longer, narrower tensors,
which XLA pipelines well. Weight norm stays in the parameterization (the
division folds into the conv weights at compile time since g and v are
constants under jit).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from torch_tts_tpu.ops.layers import Conv1d, ConvTranspose1d, leaky_relu
from torch_tts_tpu.ops.packed_conv import packed_mask_mul, repack


def _get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


class ResBlock1(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)
    pack: int = 1  # per-conv space-to-depth factor (exact equiv; legacy path)
    quant: Optional[str] = None  # "int8" W8A8 inference (unpacked path only)

    @nn.compact
    def __call__(self, x, x_mask=None, input_pack: int = 1,
                 return_kernels: bool = False):
        """input_pack > 1: x (and the return value) are space-to-depth
        packed [B, L/P, P*C]; every conv runs in packed layout and the
        elementwise ops are layout-agnostic. x_mask stays UNPACKED
        [B, L, 1] (packed_mask_mul reshapes around the multiply).

        return_kernels: create the SAME params but return the block's conv
        taps for the fused MRF kernel (kernels/mrf_fused.py) instead of
        computing — a tuple over iterations of
        ((offsets1, w1 [k*C, C], b1), (offsets2, w2 [k*C, C], b2))."""
        if return_kernels:
            from torch_tts_tpu.kernels.mrf_fused import dilated_offsets

            C = self.channels
            iters = []
            for j, d in enumerate(self.dilation):
                k1, b1 = Conv1d(
                    C, self.kernel_size,
                    padding=_get_padding(self.kernel_size, d), dilation=d,
                    weight_norm=True, name=f"conv1_{j}",
                )(x, return_kernel=True)
                k2, b2 = Conv1d(
                    C, self.kernel_size,
                    padding=_get_padding(self.kernel_size, 1),
                    weight_norm=True, name=f"conv2_{j}",
                )(x, return_kernel=True)
                iters.append((
                    (dilated_offsets(self.kernel_size, d),
                     k1.reshape(self.kernel_size * C, C), b1),
                    (dilated_offsets(self.kernel_size, 1),
                     k2.reshape(self.kernel_size * C, C), b2),
                ))
            return tuple(iters)
        mul = (lambda t: packed_mask_mul(t, x_mask, input_pack, self.channels)) \
            if x_mask is not None else (lambda t: t)
        for j, d in enumerate(self.dilation):
            xt = mul(leaky_relu(x))
            xt = Conv1d(
                self.channels,
                self.kernel_size,
                padding=_get_padding(self.kernel_size, d),
                dilation=d,
                weight_norm=True,
                pack=self.pack,
                quant=self.quant,
                name=f"conv1_{j}",
            )(xt, input_pack=input_pack)
            xt = mul(leaky_relu(xt))
            xt = Conv1d(
                self.channels,
                self.kernel_size,
                padding=_get_padding(self.kernel_size, 1),
                weight_norm=True,
                pack=self.pack,
                quant=self.quant,
                name=f"conv2_{j}",
            )(xt, input_pack=input_pack)
            x = xt + x
        return mul(x)


class ResBlock2(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3)
    pack: int = 1
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, x_mask=None, input_pack: int = 1):
        mul = (lambda t: packed_mask_mul(t, x_mask, input_pack, self.channels)) \
            if x_mask is not None else (lambda t: t)
        for j, d in enumerate(self.dilation):
            xt = mul(leaky_relu(x))
            xt = Conv1d(
                self.channels,
                self.kernel_size,
                padding=_get_padding(self.kernel_size, d),
                dilation=d,
                weight_norm=True,
                pack=self.pack,
                quant=self.quant,
                name=f"conv_{j}",
            )(xt, input_pack=input_pack)
            x = xt + x
        return mul(x)


class Generator(nn.Module):
    """Upsampling waveform decoder: conv_pre -> [upsample + MRF]* -> conv_post."""

    resblock: str = "1"
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    gin_channels: int = 0
    # pack narrow late stages (C < 128) into full lanes; exact-equivalent
    pack_narrow: bool = False
    # int8 W8A8 dynamic-quant INFERENCE on the wide unpacked stages
    # (conv_pre, wide upsamples, wide-stage resblocks — where the FLOPs
    # are); the packed narrow tail stays fp (bandwidth-bound, at its bytes
    # floor). Approximate (quality gated in BASELINE.md) — never for
    # training. ops/quant.py.
    quant_int8: bool = False
    # fused MRF resblock banks (kernels/mrf_fused.py): whole-stage
    # VMEM-resident Pallas kernel for the UNPACKED unmasked ResBlock1 stages
    # with C <= 128 (the C=128 stage is the roofline table's "next lever",
    # BASELINE.md round 3). Exact boundary semantics; inference-only wiring
    # (the training step keeps the XLA path).
    fuse_mrf: bool = False

    @nn.compact
    def __call__(self, x, g: Optional[jnp.ndarray] = None,
                 x_mask: Optional[jnp.ndarray] = None,
                 stop_after_stage: Optional[int] = None):
        """x: [B, T, C_in] latent frames -> [B, T * prod(rates), 1] waveform.

        x_mask [B, T, 1] (optional): when decoding a padded batch, masking is
        threaded through every upsample stage so outputs inside each item's
        valid region are bit-equal to decoding that item unpadded (the
        reference decodes exact lengths; a bias-valued tail would otherwise
        leak into the last receptive field).

        stop_after_stage (diagnostic, scripts/bench_infer_breakdown.py):
        -1 returns the conv_pre output, i returns the activation after
        upsample stage i's MRF bank — used to time/cost each prefix of the
        decoder pipeline. None (default) runs the full decoder.
        """
        num_kernels = len(self.resblock_kernel_sizes)
        res_cls = ResBlock1 if self.resblock == "1" else ResBlock2

        q8 = "int8" if self.quant_int8 else None
        if x_mask is not None:
            x = x * x_mask
        x = Conv1d(self.upsample_initial_channel, 7, padding=3, quant=q8,
                   name="conv_pre")(x)
        if g is not None:
            x = x + Conv1d(self.upsample_initial_channel, 1, name="cond")(g)
        if x_mask is not None:
            x = x * x_mask
        if stop_after_stage is not None and stop_after_stage < 0:
            return x

        # Packed tail (pack_narrow): once channels drop below 128 lanes the
        # activations stay in space-to-depth layout [B, L/P, P*C] with
        # P*C == 128 across EVERY op — packed transposed convs (a subpixel
        # conv's pre-reshape output IS the stride-packed layout), packed
        # resblock convs, packed conv_post — unpacking only at the final
        # waveform. Same values (tested); without it every narrow [L, C]
        # intermediate costs 128/C times its logical bytes in lane-padded
        # HBM traffic (measured: the 32-channel stage+conv_post dominated
        # batch-1 inference).
        mask = x_mask
        P = 1  # current packing factor of x
        ch_cur = self.upsample_initial_channel
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = leaky_relu(x)
            if mask is not None:
                x = packed_mask_mul(x, mask, P, ch_cur)
            pad = (k - u) // 2
            pack_stage = (
                self.pack_narrow and ch < 128 and (k - u - 2 * pad) == 0
            )
            up = ConvTranspose1d(
                ch, k, stride=u, padding=pad, weight_norm=True,
                quant=None if pack_stage else q8, name=f"up_{i}",
            )
            if pack_stage:
                x = up(x, input_pack=P, keep_packed=True)
                P = max(P, 1) * u
            else:
                assert P == 1, "cannot leave packed layout mid-pipeline"
                x = up(x)
            ch_cur = ch
            if mask is not None:
                mask = jnp.repeat(mask, u, axis=1)
                x = packed_mask_mul(x, mask, P, ch)
            # normalize the packing factor to fill (not overflow) the lanes
            if P > 1:
                P_t = max(1, min(P, 128 // ch if ch < 128 else 1))
                x = repack(x, P, P_t, ch)
                P = P_t
            fuse_stage = (
                self.fuse_mrf and res_cls is ResBlock1 and P == 1
                and mask is None and q8 is None and ch <= 128
            )
            if fuse_stage:
                from torch_tts_tpu.kernels.mrf_fused import mrf_fused

                fblocks = []
                for j, (rk, rd) in enumerate(
                    zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
                ):
                    block = ResBlock1(ch, rk, tuple(rd),
                                      name=f"resblock_{i}_{j}")
                    fblocks.append(block(x, return_kernels=True))
                x = mrf_fused(x, tuple(fblocks))
            else:
                xs = None
                for j, (rk, rd) in enumerate(
                    zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
                ):
                    block = res_cls(ch, rk, tuple(rd),
                                    quant=None if P > 1 else q8,
                                    name=f"resblock_{i}_{j}")
                    b_out = block(x, mask, input_pack=P)
                    xs = b_out if xs is None else xs + b_out
                x = xs / num_kernels
            if stop_after_stage is not None and i == stop_after_stage:
                return repack(x, P, 1, ch)

        x = leaky_relu(x, 0.01)  # final activation uses torch's default slope
        if mask is not None:
            x = packed_mask_mul(x, mask, P, ch_cur)
        x = Conv1d(1, 7, padding=3, use_bias=False, name="conv_post")(
            x, input_pack=P
        )
        x = jnp.tanh(x)
        return repack(x, P, 1, 1)
