"""GFPGAN v1 (clean) — blind face restoration for the Step-6 mouth region
(reference: third_part/GFPGAN/gfpgan/archs/gfpganv1_clean_arch.py +
stylegan2_clean_arch.py; driven by GFPGANer in gfpgan/utils.py:16-143 with
arch='clean', the v1.4 checkpoint: out_size 512, channel_multiplier 2,
different_w, sft_half, input_is_latent).

U-Net encoder -> per-level SFT conditions + style code -> StyleGAN2 decoder
with spatial feature transform on half the channels. Shares the modulated
conv / StyleConv / ToRGB math with ENet (s2v_tpu.models.layers).
"""

from __future__ import annotations

import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from s2v_tpu.models.layers import (
    Conv,
    ConvParams,
    Dense,
    ResBlockENet,
    StyleConv,
    ToRGB,
    lrelu,
)
from s2v_tpu.ops.convs import conv2d


def _channels(narrow: float, channel_multiplier: int):
    return {
        4: int(512 * narrow), 8: int(512 * narrow), 16: int(512 * narrow),
        32: int(512 * narrow), 64: int(256 * channel_multiplier * narrow),
        128: int(128 * channel_multiplier * narrow),
        256: int(64 * channel_multiplier * narrow),
        512: int(32 * channel_multiplier * narrow),
        1024: int(16 * channel_multiplier * narrow),
    }


class StyleGAN2GeneratorCSFT(nn.Module):
    """stylegan2_clean_arch.py:195-368 + CSFT forward
    (gfpganv1_clean_arch.py:11-117)."""

    out_size: int = 512
    num_style_feat: int = 512
    num_mlp: int = 8
    channel_multiplier: int = 2
    narrow: float = 1.0
    sft_half: bool = True

    @nn.compact
    def __call__(self, styles, conditions: List[jnp.ndarray],
                 input_is_latent: bool = False, deterministic: bool = True):
        ch = _channels(self.narrow, self.channel_multiplier)
        log_size = int(math.log2(self.out_size))
        num_latent = log_size * 2 - 2

        latent = styles
        if not input_is_latent:
            s = latent * jax.lax.rsqrt(
                jnp.mean(latent * latent, axis=-1, keepdims=True) + 1e-8
            )
            for i in range(self.num_mlp):
                s = lrelu(Dense(self.num_style_feat, name=f"style_mlp{i}")(s), 0.2)
            latent = s
        if latent.ndim < 3:
            latent = jnp.repeat(latent[:, None, :], num_latent, axis=1)

        b = latent.shape[0]
        const = self.param(
            "constant_input", nn.initializers.normal(1.0), (1, 4, 4, ch[4])
        )
        out = jnp.repeat(const.astype(latent.dtype), b, axis=0)
        out = StyleConv(ch[4], 3, self.num_style_feat, name="style_conv1")(
            out, latent[:, 0], deterministic=deterministic
        )
        skip = ToRGB(self.num_style_feat, upsample=False, name="to_rgb1")(
            out, latent[:, 1]
        )

        i = 1
        in_idx = 0
        for res_log in range(3, log_size + 1):
            out_ch = ch[2 ** res_log]
            out = StyleConv(out_ch, 3, self.num_style_feat,
                            sample_mode="upsample",
                            name=f"style_convs{2 * in_idx}")(
                out, latent[:, i], deterministic=deterministic)
            if i < len(conditions):
                scale, shift = conditions[i - 1], conditions[i]
                if self.sft_half:
                    half = out.shape[-1] // 2
                    out_same, out_sft = out[..., :half], out[..., half:]
                    out_sft = out_sft * scale + shift
                    out = jnp.concatenate([out_same, out_sft], axis=-1)
                else:
                    out = out * scale + shift
            out = StyleConv(out_ch, 3, self.num_style_feat,
                            name=f"style_convs{2 * in_idx + 1}")(
                out, latent[:, i + 1], deterministic=deterministic)
            skip = ToRGB(self.num_style_feat, upsample=True,
                         name=f"to_rgbs{in_idx}")(out, latent[:, i + 2], skip)
            i += 2
            in_idx += 1
        return skip


class GFPGANv1Clean(nn.Module):
    """gfpganv1_clean_arch.py:153-324 (v1.4 configuration defaults).

    Input: [B, out_size, out_size, 3] in [-1, 1]. Returns the restored image
    in [-1, 1] (out_rgbs omitted — the pipeline never consumes them).
    """

    out_size: int = 512
    num_style_feat: int = 512
    channel_multiplier: int = 2
    num_mlp: int = 8
    input_is_latent: bool = True
    different_w: bool = True
    narrow: float = 1.0
    sft_half: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        unet_narrow = self.narrow * 0.5
        ch = _channels(unet_narrow, self.channel_multiplier)
        log_size = int(math.log2(self.out_size))

        feat = lrelu(Conv(ch[self.out_size], (1, 1), name="conv_body_first")(x), 0.2)
        unet_skips = []
        for idx, i in enumerate(range(log_size, 2, -1)):
            feat = ResBlockENet(ch[2 ** (i - 1)], name=f"conv_body_down{idx}")(feat)
            unet_skips.insert(0, feat)
        feat = lrelu(Conv(ch[4], (3, 3), padding=(1, 1), name="final_conv")(feat), 0.2)

        # style code — torch flattens NCHW; keep that order for conversion
        b = feat.shape[0]
        flat = jnp.transpose(feat, (0, 3, 1, 2)).reshape(b, -1)
        if self.different_w:
            out_dim = (log_size * 2 - 2) * self.num_style_feat
        else:
            out_dim = self.num_style_feat
        style_code = Dense(out_dim, name="final_linear")(flat)
        if self.different_w:
            style_code = style_code.reshape(b, -1, self.num_style_feat)

        conditions = []
        for i in range(log_size - 2):
            feat = feat + unet_skips[i]
            feat = ResBlockENet(ch[2 ** (i + 3)], mode="up",
                                name=f"conv_body_up{i}")(feat)
            sft_ch = ch[2 ** (i + 3)] if self.sft_half else ch[2 ** (i + 3)] * 2
            ch_i = ch[2 ** (i + 3)]
            if 2 * max(ch_i, sft_ch) <= 128:
                # MXU-fill fusion (exact): below 128 channels a TPU conv's
                # cost is set by the 128-lane padding, not by C — so the
                # scale and shift branches (same input `feat`) are computed
                # as ONE 2C-wide pipeline: first convs concatenated along
                # Cout, second convs as one block-diagonal conv (off-diagonal
                # blocks are exact zeros). Param tree is unchanged
                # (ConvParams declares Conv's exact params). Reference
                # computes the two branches separately
                # (gfpgan_arch.py condition_scale/condition_shift).
                ws0, bs0 = ConvParams(ch_i, name=f"condition_scale{i}_0")(
                    feat.shape[-1])
                ws2, bs2 = ConvParams(sft_ch, name=f"condition_scale{i}_2")(
                    ch_i)
                wh0, bh0 = ConvParams(ch_i, name=f"condition_shift{i}_0")(
                    feat.shape[-1])
                wh2, bh2 = ConvParams(sft_ch, name=f"condition_shift{i}_2")(
                    ch_i)
                y = lrelu(conv2d(
                    feat, jnp.concatenate([ws0, wh0], axis=-1),
                    jnp.concatenate([bs0, bh0]), padding=(1, 1)), 0.2)
                w2 = jnp.zeros((3, 3, 2 * ch_i, 2 * sft_ch), ws2.dtype)
                w2 = w2.at[:, :, :ch_i, :sft_ch].set(ws2)
                w2 = w2.at[:, :, ch_i:, sft_ch:].set(wh2)
                z = conv2d(y, w2, jnp.concatenate([bs2, bh2]),
                           padding=(1, 1))
                scale, shift = z[..., :sft_ch], z[..., sft_ch:]
            else:
                scale = Conv(sft_ch, (3, 3), padding=(1, 1),
                             name=f"condition_scale{i}_2")(
                    lrelu(Conv(ch_i, (3, 3), padding=(1, 1),
                               name=f"condition_scale{i}_0")(feat), 0.2))
                shift = Conv(sft_ch, (3, 3), padding=(1, 1),
                             name=f"condition_shift{i}_2")(
                    lrelu(Conv(ch_i, (3, 3), padding=(1, 1),
                               name=f"condition_shift{i}_0")(feat), 0.2))
            conditions.extend([scale, shift])

        return StyleGAN2GeneratorCSFT(
            self.out_size, self.num_style_feat, self.num_mlp,
            self.channel_multiplier, self.narrow, self.sft_half,
            name="stylegan_decoder",
        )(style_code, conditions, input_is_latent=self.input_is_latent,
          deterministic=deterministic)


# ---------------------------------------------------------------------------
# GFPGANv1 — the ORIGINAL architecture (gfpganv1_arch.py:12-404): basicsr
# StyleGAN2 decoder (blur-resample + equalized lr, the GFPGANv1.pth family)
# with SFT conditions. The bilinear variant (gfpgan_bilinear_arch.py) is the
# CUDA-op-free inference twin of this same architecture/weights.
# Reuses GPEN's StyleGAN2 pieces (models/gpen.py) with add-noise
# (isconcat=False) — identical math to basicsr.archs.stylegan2_arch.
# ---------------------------------------------------------------------------


class StyleGAN2GeneratorSFT(nn.Module):
    """gfpganv1_arch.py:12-131: basicsr StyleGAN2Generator + SFT injection."""

    out_size: int = 512
    num_style_feat: int = 512
    num_mlp: int = 8
    channel_multiplier: int = 1
    narrow: float = 1.0
    sft_half: bool = False

    @nn.compact
    def __call__(self, styles, conditions: List, input_is_latent: bool = False,
                 deterministic: bool = True):
        from s2v_tpu.models.gpen import (
            EqualLinear,
            GPENToRGB,
            StyledConv,
            channels_table,
        )

        ch = channels_table(self.narrow, self.channel_multiplier)
        log_size = int(math.log2(self.out_size))
        n_latent = log_size * 2 - 2

        latent = styles
        if not input_is_latent:
            s = latent * jax.lax.rsqrt(
                jnp.mean(latent * latent, axis=-1, keepdims=True) + 1e-8)
            for i in range(self.num_mlp):
                s = EqualLinear(self.num_style_feat, lr_mul=0.01,
                                activation="fused_lrelu",
                                name=f"style{i}")(s)
            latent = s
        if latent.ndim < 3:
            latent = jnp.repeat(latent[:, None, :], n_latent, axis=1)

        b = latent.shape[0]
        const = self.param("constant_input", nn.initializers.normal(1.0),
                           (1, 4, 4, ch[4]))
        out = jnp.repeat(const.astype(latent.dtype), b, axis=0)
        out = StyledConv(ch[4], 3, self.num_style_feat, isconcat=False,
                         name="style_conv1")(out, latent[:, 0],
                                             deterministic=deterministic)
        skip = GPENToRGB(self.num_style_feat, upsample=False, name="to_rgb1")(
            out, latent[:, 1])

        i = 1
        for idx, res_log in enumerate(range(3, log_size + 1)):
            out_ch = ch[2 ** res_log]
            out = StyledConv(out_ch, 3, self.num_style_feat, upsample=True,
                             isconcat=False, name=f"style_convs{2 * idx}")(
                out, latent[:, i], deterministic=deterministic)
            if i < len(conditions):
                if self.sft_half:  # SFT on the second half of the channels
                    half = out.shape[-1] // 2
                    same, sft = out[..., :half], out[..., half:]
                    sft = sft * conditions[i - 1] + conditions[i]
                    out = jnp.concatenate([same, sft], axis=-1)
                else:
                    out = out * conditions[i - 1] + conditions[i]
            out = StyledConv(out_ch, 3, self.num_style_feat, isconcat=False,
                             name=f"style_convs{2 * idx + 1}")(
                out, latent[:, i + 1], deterministic=deterministic)
            skip = GPENToRGB(self.num_style_feat, name=f"to_rgbs{idx}")(
                out, latent[:, i + 2], skip)
            i += 2
        return skip


class ConvUpLayer(nn.Module):
    """gfpganv1_arch.py:132-196: bilinear x2 + equalized conv + fused lrelu."""

    features: int
    kernel: int
    padding: int = 0
    use_bias: bool = True
    activate: bool = True

    @nn.compact
    def __call__(self, x):
        from s2v_tpu.models.gpen import EqualConv
        from s2v_tpu.ops.image import resize_bilinear
        from s2v_tpu.ops.pallas.fused_act import fused_bias_leaky_relu_ref

        h, w = x.shape[1:3]
        x = resize_bilinear(x, (2 * h, 2 * w))
        x = EqualConv(self.features, self.kernel, 1, self.padding,
                      use_bias=self.use_bias and not self.activate,
                      name="conv")(x)
        if self.activate:
            if self.use_bias:
                bias = self.param("act_bias", nn.initializers.zeros,
                                  (self.features,))
                return fused_bias_leaky_relu_ref(x, bias)
            return (2.0 ** 0.5) * jnp.where(x >= 0, x, 0.2 * x)
        return x


class ResUpBlock(nn.Module):
    """gfpganv1_arch.py:197-219."""

    features: int

    @nn.compact
    def __call__(self, x):
        from s2v_tpu.models.gpen import ConvLayer

        out = ConvLayer(x.shape[-1], 3, name="conv1")(x)
        out = ConvUpLayer(self.features, 3, 1, name="conv2")(out)
        skip = ConvUpLayer(self.features, 1, use_bias=False, activate=False,
                           name="skip")(x)
        return (out + skip) / math.sqrt(2)


class GFPGANv1(nn.Module):
    """gfpganv1_arch.py:221-404 (the GFPGANv1.pth configuration:
    channel_multiplier 1, sft_half False unless set)."""

    out_size: int = 512
    num_style_feat: int = 512
    channel_multiplier: int = 1
    different_w: bool = False
    narrow: float = 1.0
    sft_half: bool = False
    input_is_latent: bool = False
    num_mlp: int = 8

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from s2v_tpu.models.gpen import ConvLayer, EqualConv, EqualLinear, GPENResBlock

        unet_narrow = self.narrow * 0.5
        ch = _channels(unet_narrow, self.channel_multiplier)
        log_size = int(math.log2(self.out_size))

        feat = ConvLayer(ch[self.out_size], 1, name="conv_body_first")(x)
        unet_skips = []
        for i in range(log_size, 2, -1):
            feat = GPENResBlock(ch[2 ** (i - 1)],
                                name=f"conv_body_down{log_size - i}")(feat)
            unet_skips.insert(0, feat)
        feat = ConvLayer(ch[4], 3, name="final_conv")(feat)

        flat = jnp.transpose(feat, (0, 3, 1, 2)).reshape(feat.shape[0], -1)
        n_latent = log_size * 2 - 2
        lin_out = (n_latent * self.num_style_feat if self.different_w
                   else self.num_style_feat)
        style_code = EqualLinear(lin_out, name="final_linear")(flat)
        if self.different_w:
            style_code = style_code.reshape(
                style_code.shape[0], -1, self.num_style_feat)

        conditions = []
        out_rgbs = []
        for i in range(log_size - 2):
            feat = feat + unet_skips[i]
            feat = ResUpBlock(ch[2 ** (i + 3)], name=f"conv_body_up{i}")(feat)
            sft_ch = feat.shape[-1] if self.sft_half else feat.shape[-1] * 2
            scale = EqualConv(feat.shape[-1], 3, 1, 1,
                              name=f"condition_scale{i}_0")(feat)
            scale = (2.0 ** 0.5) * jnp.where(scale >= 0, scale, 0.2 * scale)
            scale = EqualConv(sft_ch, 3, 1, 1,
                              name=f"condition_scale{i}_1")(scale)
            shift = EqualConv(feat.shape[-1], 3, 1, 1,
                              name=f"condition_shift{i}_0")(feat)
            shift = (2.0 ** 0.5) * jnp.where(shift >= 0, shift, 0.2 * shift)
            shift = EqualConv(sft_ch, 3, 1, 1,
                              name=f"condition_shift{i}_1")(shift)
            conditions.append(scale)
            conditions.append(shift)
            out_rgbs.append(EqualConv(3, 1, name=f"toRGB{i}")(feat))

        image = StyleGAN2GeneratorSFT(
            self.out_size, self.num_style_feat, self.num_mlp,
            self.channel_multiplier,
            self.narrow, self.sft_half, name="stylegan_decoder",
        )(style_code, conditions, input_is_latent=self.input_is_latent,
          deterministic=deterministic)
        return image, out_rgbs


def gfpgan_arch(variables, arch: str = "clean", out_size: int = 512, **kw):
    """GFPGAN geometry (narrow / channel_multiplier / num_style_feat /
    num_mlp) inferred from a variable tree — converted GFPGANv1.x
    checkpoints are the production widths (gfpgan/utils.py:43-82), test
    fixtures may be narrow. ``arch``/``out_size`` and the bool wiring
    flags stay caller-chosen (utils.py picks them per checkpoint file
    name); explicit ``kw`` entries override inferred values. Shape-only:
    eval_shape trees work."""
    cls = GFPGANv1Clean if arch == "clean" else GFPGANv1
    try:
        p = variables["params"]
        conv = (lambda t: t["weight"]) if arch == "clean" else (
            lambda t: t["conv"]["weight"])
        unet_narrow = float(conv(p["final_conv"]).shape[-1]) / 512.0
        base = _channels(unet_narrow, 1)[out_size]
        cm = int(conv(p["conv_body_first"]).shape[-1]) / base
        dec = p["stylegan_decoder"]
        num_mlp = sum(1 for k in dec
                      if k.startswith("style_mlp") and k[9:].isdigit())
        num_mlp = num_mlp or sum(1 for k in dec
                                 if k.startswith("style") and k[5:].isdigit())
        out_dim = int(p["final_linear"]["weight"].shape[-1])
        n_latent = 2 * int(math.log2(out_size)) - 2
        different_w = kw.get("different_w", cls.different_w)
        if different_w and out_dim % n_latent == 0:
            num_style_feat = out_dim // n_latent
        else:
            num_style_feat = out_dim
        inferred = dict(
            out_size=out_size,
            num_style_feat=num_style_feat,
            channel_multiplier=int(cm) if cm == int(cm) else cm,
            narrow=2.0 * unet_narrow,
            num_mlp=num_mlp or cls.num_mlp,
        )
        inferred.update(kw)
        return cls(**inferred)
    except (KeyError, TypeError, AttributeError, ZeroDivisionError):
        return cls(out_size=out_size, **kw)
