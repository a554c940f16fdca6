"""GPEN — GAN-prior blind face restoration (reference:
third_part/GPEN/face_model/gpen_model.py). Used twice in the pipeline:
BFR-512 reference enhancement (inference.py:225-227) and BFR-2048 final
enhancement (inference.py:228-231).

Architecture: a CNN encoder produces a latent + per-resolution feature maps;
a StyleGAN2 generator consumes the latent while the encoder features are
*concatenated* as "noise" at each level (NoiseInjection(isconcat=True),
gpen_model.py:287-301) — the GAN-prior embedding.

TPU-first notes:
- All blur/up/down resampling goes through s2v_tpu.ops.pallas.upfirdn2d
  (Pallas on TPU, XLA depthwise elsewhere) — the reference's CUDA op.
- The fused bias+leaky activation is the Pallas fused_bias_leaky_relu.
- Modulated convs fold modulation/demodulation into input/output channel
  scales around ONE shared conv (no per-sample grouped conv), including the
  transposed-conv upsample variant.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from s2v_tpu.ops.convs import conv2d
from s2v_tpu.ops.pallas.fused_act import fused_bias_leaky_relu_ref
from s2v_tpu.ops.pallas.upfirdn2d import upfirdn2d


def make_kernel(k) -> np.ndarray:
    k = np.asarray(k, np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    return k / k.sum()


def channels_table(narrow: float, channel_multiplier: int):
    return {
        4: int(512 * narrow), 8: int(512 * narrow), 16: int(512 * narrow),
        32: int(512 * narrow), 64: int(256 * channel_multiplier * narrow),
        128: int(128 * channel_multiplier * narrow),
        256: int(64 * channel_multiplier * narrow),
        512: int(32 * channel_multiplier * narrow),
        1024: int(16 * channel_multiplier * narrow),
        2048: int(8 * channel_multiplier * narrow),
    }


class EqualConv(nn.Module):
    """EqualConv2d (gpen_model.py:101-135): weight scaled by 1/sqrt(fan_in)."""

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.kernel
        w = self.param("weight", nn.initializers.normal(1.0),
                       (k, k, cin, self.features))
        scale = 1.0 / math.sqrt(cin * k * k)
        b = (self.param("bias", nn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        return conv2d(x, w * scale, b, stride=self.stride, padding=self.padding)


class EqualLinear(nn.Module):
    """gpen_model.py:138-171."""

    features: int
    lr_mul: float = 1.0
    activation: Optional[str] = None
    bias_init: float = 0.0

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.normal(1.0 / self.lr_mul),
                       (x.shape[-1], self.features))
        b = self.param("bias",
                       nn.initializers.constant(self.bias_init),
                       (self.features,))
        scale = (1.0 / math.sqrt(x.shape[-1])) * self.lr_mul
        out = x @ (w * scale).astype(x.dtype)
        if self.activation == "fused_lrelu":
            return fused_bias_leaky_relu_ref(out, b * self.lr_mul)
        return out + (b * self.lr_mul).astype(out.dtype)


def blur(x, kernel: np.ndarray, pad: Tuple[int, int]):
    return upfirdn2d(x, kernel, up=1, down=1, pad=pad)


def upsample2(x, kernel_taps=(1, 3, 3, 1)):
    """Upsample (gpen_model.py:37-55)."""
    k = make_kernel(kernel_taps) * 4
    p = k.shape[0] - 2
    return upfirdn2d(x, k, up=2, down=1, pad=((p + 1) // 2 + 1, p // 2))


def downsample2(x, kernel_taps=(1, 3, 3, 1)):
    """Downsample (gpen_model.py:58-76)."""
    k = make_kernel(kernel_taps)
    p = k.shape[0] - 2
    return upfirdn2d(x, k, up=1, down=2, pad=((p + 1) // 2, p // 2))


class GPENModulatedConv(nn.Module):
    """gpen_model.py:187-283 as input/output-scaled shared convs."""

    features: int
    kernel: int
    style_dim: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_taps: Tuple[int, ...] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, style):
        b, h, w, cin = x.shape
        k = self.kernel
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (k, k, cin, self.features))
        scale = 1.0 / math.sqrt(cin * k * k)
        s = EqualLinear(cin, bias_init=1.0, name="modulation")(style)  # [B, Cin]

        if self.demodulate:
            w2 = jnp.square(weight * scale).sum(axis=(0, 1))  # [Cin, Cout]
            sig2 = jnp.square(s) @ w2
            demod = jax.lax.rsqrt(sig2 + 1e-8)  # [B, Cout]

        xs = x * s[:, None, None, :].astype(x.dtype)
        if self.upsample:
            # conv_transpose2d(stride=2, padding=0): lhs-dilate + full pad +
            # flipped kernel (gpen_model.py:256-265), then blur
            wt = jnp.flip(weight * scale, (0, 1)).astype(x.dtype)
            out = jax.lax.conv_general_dilated(
                xs, wt, (1, 1), [(k - 1, k - 1), (k - 1, k - 1)],
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if self.demodulate:
                out = out * demod[:, None, None, :].astype(out.dtype)
            kb = make_kernel(self.blur_taps) * 4
            p = (kb.shape[0] - 2) - (k - 1)
            out = blur(out, kb, ((p + 1) // 2 + 1, p // 2 + 1))
        elif self.downsample:
            kb = make_kernel(self.blur_taps)
            p = (kb.shape[0] - 2) + (k - 1)
            xs = blur(xs, kb, ((p + 1) // 2, p // 2))
            out = conv2d(xs, (weight * scale), stride=2, padding=0)
            if self.demodulate:
                out = out * demod[:, None, None, :].astype(out.dtype)
        else:
            out = conv2d(xs, (weight * scale), padding=k // 2)
            if self.demodulate:
                out = out * demod[:, None, None, :].astype(out.dtype)
        return out


class StyledConv(nn.Module):
    """gpen_model.py:316-352: modconv -> noise concat -> fused lrelu."""

    features: int
    kernel: int
    style_dim: int
    upsample: bool = False
    isconcat: bool = True

    @nn.compact
    def __call__(self, x, style, noise=None, deterministic: bool = False):
        out = GPENModulatedConv(
            self.features, self.kernel, self.style_dim,
            upsample=self.upsample, name="conv",
        )(x, style)
        nw = self.param("noise_weight", nn.initializers.zeros, (1,))
        if noise is None:
            if deterministic:
                noise = jnp.zeros_like(out)
            else:
                noise = jax.random.normal(self.make_rng("noise"), out.shape,
                                          out.dtype)
        if self.isconcat:
            out = jnp.concatenate([out, nw.astype(out.dtype) * noise], axis=-1)
        else:
            out = out + nw.astype(out.dtype) * noise
        mult = 2 if self.isconcat else 1
        bias = self.param("act_bias", nn.initializers.zeros,
                          (self.features * mult,))
        return fused_bias_leaky_relu_ref(out, bias)


class GPENToRGB(nn.Module):
    """gpen_model.py:355-377."""

    style_dim: int
    upsample: bool = True

    @nn.compact
    def __call__(self, x, style, skip=None):
        out = GPENModulatedConv(3, 1, self.style_dim, demodulate=False,
                                name="conv")(x, style)
        bias = self.param("bias", nn.initializers.zeros, (3,))
        out = out + bias.astype(out.dtype)
        if skip is not None:
            out = out + upsample2(skip)
        return out


class ConvLayer(nn.Module):
    """gpen_model.py:557-605: optional blur-downsample + EqualConv + fused act."""

    features: int
    kernel: int
    downsample: bool = False
    use_bias: bool = True
    activate: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        if self.downsample:
            kb = make_kernel((1, 3, 3, 1))
            p = (kb.shape[0] - 2) + (k - 1)
            x = blur(x, kb, ((p + 1) // 2, p // 2))
            stride, padding = 2, 0
        else:
            stride, padding = 1, k // 2
        x = EqualConv(self.features, k, stride, padding,
                      use_bias=self.use_bias and not self.activate,
                      name="conv")(x)
        if self.activate:
            if self.use_bias:
                bias = self.param("act_bias", nn.initializers.zeros,
                                  (self.features,))
                return fused_bias_leaky_relu_ref(x, bias)
            return (2.0 ** 0.5) * jnp.where(x >= 0, x, 0.2 * x)
        return x


class GPENResBlock(nn.Module):
    """gpen_model.py:607-626 (used by the Discriminator)."""

    features: int

    @nn.compact
    def __call__(self, x):
        out = ConvLayer(x.shape[-1], 3, name="conv1")(x)
        out = ConvLayer(self.features, 3, downsample=True, name="conv2")(out)
        skip = ConvLayer(self.features, 1, downsample=True, use_bias=False,
                         activate=False, name="skip")(x)
        return (out + skip) / math.sqrt(2)


class Generator(nn.Module):
    """gpen_model.py:380-551 with isconcat (GAN-prior) noise."""

    size: int = 512
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    lr_mlp: float = 0.01
    isconcat: bool = True
    narrow: float = 1.0

    @nn.compact
    def __call__(self, styles, noise: Optional[List] = None,
                 input_is_latent: bool = False, deterministic: bool = False):
        ch = channels_table(self.narrow, self.channel_multiplier)
        log_size = int(math.log2(self.size))
        n_latent = log_size * 2 - 2
        mult = 2 if self.isconcat else 1

        latent = styles
        if not input_is_latent:
            s = latent * jax.lax.rsqrt(
                jnp.mean(latent * latent, axis=-1, keepdims=True) + 1e-8
            )
            for i in range(self.n_mlp):
                s = EqualLinear(self.style_dim, lr_mul=self.lr_mlp,
                                activation="fused_lrelu", name=f"style{i}")(s)
            latent = s
        if latent.ndim < 3:
            latent = jnp.repeat(latent[:, None, :], n_latent, axis=1)

        if noise is None:
            noise = [None] * (2 * (log_size - 2) + 1)

        b = latent.shape[0]
        const = self.param("constant_input", nn.initializers.normal(1.0),
                           (1, 4, 4, ch[4]))
        out = jnp.repeat(const.astype(latent.dtype), b, axis=0)
        out = StyledConv(ch[4], 3, self.style_dim, isconcat=self.isconcat,
                         name="conv1")(out, latent[:, 0], noise[0],
                                       deterministic=deterministic)
        skip = GPENToRGB(self.style_dim, upsample=False, name="to_rgb1")(
            out, latent[:, 1]
        )

        i = 1
        for idx, res_log in enumerate(range(3, log_size + 1)):
            out_ch = ch[2 ** res_log]
            out = StyledConv(out_ch, 3, self.style_dim, upsample=True,
                             isconcat=self.isconcat, name=f"convs{2 * idx}")(
                out, latent[:, i], noise[2 * idx + 1],
                deterministic=deterministic)
            out = StyledConv(out_ch, 3, self.style_dim,
                             isconcat=self.isconcat, name=f"convs{2 * idx + 1}")(
                out, latent[:, i + 1], noise[2 * idx + 2],
                deterministic=deterministic)
            skip = GPENToRGB(self.style_dim, name=f"to_rgbs{idx}")(
                out, latent[:, i + 2], skip)
            i += 2
        return skip


class FullGenerator(nn.Module):
    """gpen_model.py:628-690: encoder -> latent + per-level features fed as
    the generator's concat-noise. in/out size equal (BFR-512/1024/2048)."""

    size: int = 512
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    isconcat: bool = True
    narrow: float = 1.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        ch = channels_table(self.narrow, self.channel_multiplier)
        log_size = int(math.log2(self.size))

        feats = []
        feat = ConvLayer(ch[self.size], 1, name="ecd0")(x)
        feats.append(feat)
        for idx, i in enumerate(range(log_size, 2, -1)):
            feat = ConvLayer(ch[2 ** (i - 1)], 3, downsample=True,
                             name=f"ecd{idx + 1}")(feat)
            feats.append(feat)
        b = feat.shape[0]
        flat = jnp.transpose(feat, (0, 3, 1, 2)).reshape(b, -1)
        latent = EqualLinear(self.style_dim, activation="fused_lrelu",
                             name="final_linear")(flat)

        # encoder features as noise: repeat each twice, reverse, drop first
        noise = []
        for f in feats:
            noise.extend([f, f])
        noise = noise[::-1][1:]
        return Generator(
            self.size, self.style_dim, self.n_mlp, self.channel_multiplier,
            isconcat=self.isconcat, narrow=self.narrow, name="generator",
        )(latent, noise=noise, deterministic=deterministic)


class FullGeneratorSR(nn.Module):
    """gpen_model.py:752-818: in_size encoder, out_size generator; the upper
    generator levels get no encoder features (fresh noise)."""

    in_size: int = 512
    out_size: int = 2048
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    isconcat: bool = True
    narrow: float = 1.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        ch = channels_table(self.narrow, self.channel_multiplier)
        log_in = int(math.log2(self.in_size))
        log_out = int(math.log2(self.out_size))

        feats = []
        feat = ConvLayer(ch[self.in_size], 1, name="ecd0")(x)
        feats.append(feat)
        for idx, i in enumerate(range(log_in, 2, -1)):
            feat = ConvLayer(ch[2 ** (i - 1)], 3, downsample=True,
                             name=f"ecd{idx + 1}")(feat)
            feats.append(feat)
        b = feat.shape[0]
        flat = jnp.transpose(feat, (0, 3, 1, 2)).reshape(b, -1)
        latent = EqualLinear(self.style_dim, activation="fused_lrelu",
                             name="final_linear")(flat)

        noise: List = [None] * (log_out - log_in)
        noise.extend(feats)
        noise2 = []
        for f in noise:
            noise2.extend([f, f])
        noise2 = noise2[::-1][1:]
        return Generator(
            self.out_size, self.style_dim, self.n_mlp,
            self.channel_multiplier, isconcat=self.isconcat,
            narrow=self.narrow, name="generator",
        )(latent, noise=noise2, deterministic=deterministic)


class Discriminator(nn.Module):
    """gpen_model.py:692-750 with minibatch stddev."""

    size: int = 512
    channel_multiplier: int = 2
    narrow: float = 1.0

    @nn.compact
    def __call__(self, x):
        ch = channels_table(self.narrow, self.channel_multiplier)
        log_size = int(math.log2(self.size))
        out = ConvLayer(ch[self.size], 1, name="conv0")(x)
        for idx, i in enumerate(range(log_size, 2, -1)):
            out = GPENResBlock(ch[2 ** (i - 1)], name=f"res{idx}")(out)

        b, h, w, c = out.shape
        stddev = jnp.sqrt(out.var(axis=0) + 1e-8).mean()  # group = full batch
        stddev = jnp.broadcast_to(stddev, (b, h, w, 1)).astype(out.dtype)
        out = jnp.concatenate([out, stddev], axis=-1)

        out = ConvLayer(ch[4], 3, name="final_conv")(out)
        flat = jnp.transpose(out, (0, 3, 1, 2)).reshape(b, -1)
        out = EqualLinear(ch[4], activation="fused_lrelu", name="final_linear0")(flat)
        return EqualLinear(1, name="final_linear1")(out)


def fullgenerator_arch(variables, size: int = 512) -> FullGenerator:
    """FullGenerator geometry (narrow / channel_multiplier / style_dim /
    n_mlp) inferred from a variable tree — converted GPEN-BFR checkpoints
    are the production table (gpen_model.py:640-652), test fixtures may be
    narrow. ``size`` stays caller-chosen (it is a runtime resolution, not
    recoverable from widths alone). Shape-only: eval_shape trees work."""
    try:
        p = variables["params"]
        gen = p["generator"]
        narrow = float(gen["constant_input"].shape[-1]) / 512.0
        kw = dict(
            size=size,
            style_dim=int(p["final_linear"]["weight"].shape[-1]),
            n_mlp=sum(1 for k in gen
                      if k.startswith("style") and k[5:].isdigit()),
            narrow=narrow,
        )
        base = channels_table(narrow, 1)[size]
        if size >= 64:  # cm only reaches the table at res >= 64
            cm = int(p["ecd0"]["conv"]["weight"].shape[-1]) / base
            kw["channel_multiplier"] = int(cm) if cm == int(cm) else cm
        return FullGenerator(**kw)
    except (KeyError, TypeError, AttributeError, ZeroDivisionError):
        return FullGenerator(size=size)
