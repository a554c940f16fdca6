"""Shared neural blocks (reference: models/base_blocks.py).

flax.linen modules in NHWC. Conditioning vectors ("z": the 256-d 3DMM
descriptor or 512-d audio feature) are passed as [B, F].

Conventions carried over from the reference for checkpoint parity:
- LayerNorm2d normalizes over (C, H, W) jointly with per-channel affine
  (base_blocks.py:52-69).
- FineADAINResBlock2d reproduces the reference's forward exactly, including
  its quirk of discarding the first conv branch (base_blocks.py:173-177:
  ``dx`` is overwritten, so out = norm2(conv2(x), z) + x).
- Spectral norm (use_spect=True paths) is a training-time reparameterization;
  converted checkpoints arrive pre-folded (weight = weight_orig / sigma), so
  inference modules hold plain conv weights.
- StyleConv noise injection draws fresh normals per call
  (base_blocks.py:528-531); here the PRNG is explicit via the 'noise' rng
  collection, with a deterministic zero-noise mode for tests.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from s2v_tpu.ops.convs import (
    bias_uniform_init,
    conv2d,
    conv_transpose2d,
    kaiming_uniform_init,
)
from s2v_tpu.ops.image import avg_pool_2x2, resize_bilinear, resize_nearest
from s2v_tpu.ops.norms import instance_norm_2d, layer_norm_chw

Dtype = Any


def lrelu(x, slope):
    return jnp.where(x >= 0, x, x * slope)


class Conv(nn.Module):
    """torch nn.Conv2d twin: weight [kh,kw,Cin,Cout], torch default init."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    padding_mode: str = "zeros"
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kh, kw = self.kernel
        w = self.param(
            "weight", kaiming_uniform_init, (kh, kw, cin // self.groups, self.features)
        )
        b = (
            self.param(
                "bias", bias_uniform_init(kh * kw * cin // self.groups), (self.features,)
            )
            if self.use_bias
            else None
        )
        return conv2d(
            x, w, b,
            stride=self.stride, padding=self.padding, dilation=self.dilation,
            groups=self.groups, padding_mode=self.padding_mode,
        )


class ConvParams(nn.Module):
    """Declares the exact param tree of :class:`Conv` without computing.

    Used by callers that fuse several sibling convolutions into one wider
    convolution for MXU-lane fill (e.g. the GFPGAN SFT condition branches,
    gfpgan.py) while keeping checkpoint-compatible parameter names/shapes.
    Init distributions are byte-identical to Conv's.
    """

    features: int
    kernel: Tuple[int, int] = (3, 3)
    use_bias: bool = True
    groups: int = 1

    @nn.compact
    def __call__(self, cin: int):
        kh, kw = self.kernel
        w = self.param(
            "weight", kaiming_uniform_init, (kh, kw, cin // self.groups, self.features)
        )
        b = (
            self.param(
                "bias", bias_uniform_init(kh * kw * cin // self.groups), (self.features,)
            )
            if self.use_bias
            else None
        )
        return w, b


class ConvTranspose(nn.Module):
    """torch nn.ConvTranspose2d twin (k3 s2 p1 op1 by default)."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (2, 2)
    padding: Tuple[int, int] = (1, 1)
    output_padding: Tuple[int, int] = (1, 1)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kh, kw = self.kernel
        w = self.param(
            "weight", kaiming_uniform_init, (kh, kw, self.features, cin)
        )
        b = (
            self.param("bias", bias_uniform_init(kh * kw * cin), (self.features,))
            if self.use_bias
            else None
        )
        return conv_transpose2d(
            x, w, b,
            stride=self.stride, padding=self.padding,
            output_padding=self.output_padding,
        )


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    weight_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        w_init = self.weight_init or kaiming_uniform_init
        w = self.param("weight", w_init, (x.shape[-1], self.features))
        out = x @ w.astype(x.dtype)
        if self.use_bias:
            b_init = self.bias_init or bias_uniform_init(x.shape[-1])
            b = self.param("bias", b_init, (self.features,))
            out = out + b.astype(out.dtype)
        return out


class BatchNorm2d(nn.Module):
    """torch nn.BatchNorm2d twin with explicit running stats."""

    features: int
    eps: float = 1e-5
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch

    @nn.compact
    def __call__(self, x, train: bool = False):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "running_mean", lambda: jnp.zeros(self.features)
        )
        ra_var = self.variable(
            "batch_stats", "running_var", lambda: jnp.ones(self.features)
        )
        if train:
            axes = tuple(range(x.ndim - 1))
            mean = x.mean(axes)
            var = x.var(axes)
            n = x.size // self.features
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                unbiased = var * n / max(n - 1, 1)
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = (weight * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        return x * inv + (bias - mean * weight * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)


class LayerNorm2d(nn.Module):
    """Reference LayerNorm2d (base_blocks.py:52-69)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return layer_norm_chw(x, weight.astype(x.dtype), bias.astype(x.dtype), self.eps)


def make_norm(norm: Optional[str], features: int, name: str):
    if norm is None:
        return None
    if norm == "layer":
        return LayerNorm2d(features, name=name)
    if norm == "batch":
        return BatchNorm2d(features, name=name)
    raise ValueError(norm)


class ConvBNReLU(nn.Module):
    """Reference base_blocks.Conv2d (audio encoder block): conv+BN+ReLU."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (1, 1)
    residual: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = Conv(self.features, self.kernel, self.stride, self.padding,
                   name="conv")(x)
        out = BatchNorm2d(self.features, name="bn")(out, train=train)
        if self.residual:
            out = out + x
        return jax.nn.relu(out)


class AdaIN(nn.Module):
    """ADAIN (base_blocks.py:127-157): instance norm modulated by z."""

    features: int
    hidden: int = 128

    @nn.compact
    def __call__(self, x, z):
        normalized = instance_norm_2d(x)
        h = jax.nn.relu(Dense(self.hidden, name="mlp_shared")(z))
        gamma = Dense(self.features, name="mlp_gamma")(h)
        beta = Dense(self.features, name="mlp_beta")(h)
        return normalized * (1.0 + gamma[:, None, None, :]) + beta[:, None, None, :]


class FirstBlock2d(nn.Module):
    features: int
    norm: Optional[str] = "layer"
    slope: float = 0.1

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, (7, 7), padding=(3, 3), name="conv")(x)
        norm = make_norm(self.norm, self.features, "norm")
        if norm is not None:
            x = norm(x)
        return lrelu(x, self.slope)


class DownBlock2d(nn.Module):
    features: int
    norm: Optional[str] = "layer"
    slope: float = 0.1

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, (3, 3), padding=(1, 1), name="conv")(x)
        norm = make_norm(self.norm, self.features, "norm")
        if norm is not None:
            x = norm(x)
        return avg_pool_2x2(lrelu(x, self.slope))


class UpBlock2d(nn.Module):
    features: int
    norm: Optional[str] = "layer"
    slope: float = 0.1

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = resize_nearest(x, (2 * h, 2 * w))
        x = Conv(self.features, (3, 3), padding=(1, 1), name="conv")(x)
        norm = make_norm(self.norm, self.features, "norm")
        if norm is not None:
            x = norm(x)
        return lrelu(x, self.slope)


class Jump(nn.Module):
    features: int
    norm: Optional[str] = "layer"
    slope: float = 0.1

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, (3, 3), padding=(1, 1), name="conv")(x)
        norm = make_norm(self.norm, self.features, "norm")
        if norm is not None:
            x = norm(x)
        return lrelu(x, self.slope)


class FinalBlock2d(nn.Module):
    features: int
    activation: str = "sigmoid"  # 'sigmoid' | 'tanh'

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, (7, 7), padding=(3, 3), name="conv")(x)
        return jax.nn.sigmoid(x) if self.activation == "sigmoid" else jnp.tanh(x)


class FineADAINResBlock2d(nn.Module):
    """base_blocks.py:160-177 — replicated exactly, including the quirk that
    the conv1 branch result is discarded (``dx`` is overwritten)."""

    features: int
    slope: float = 0.1

    @nn.compact
    def __call__(self, x, z):
        dx = lrelu(AdaIN(self.features, name="norm1")(
            Conv(self.features, (3, 3), padding=(1, 1), name="conv1")(x), z
        ), self.slope)
        del dx  # reference overwrites this branch (base_blocks.py:174-175)
        dx = AdaIN(self.features, name="norm2")(
            Conv(self.features, (3, 3), padding=(1, 1), name="conv2")(x), z
        )
        return dx + x


class FineADAINResBlocks(nn.Module):
    num_block: int
    features: int
    slope: float = 0.1

    @nn.compact
    def __call__(self, x, z):
        for i in range(self.num_block):
            x = FineADAINResBlock2d(self.features, self.slope, name=f"res{i}")(x, z)
        return x


class FineEncoder(nn.Module):
    """base_blocks.py:255-275."""

    ngf: int
    img_f: int
    layers: int
    norm: Optional[str] = "layer"
    slope: float = 0.1

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:
        x = FirstBlock2d(self.ngf, self.norm, self.slope, name="first")(x)
        out = [x]
        for i in range(self.layers):
            ch = min(self.ngf * (2 ** (i + 1)), self.img_f)
            x = DownBlock2d(ch, self.norm, self.slope, name=f"down{i}")(x)
            out.append(x)
        return out


class FineDecoder(nn.Module):
    """base_blocks.py:278-305."""

    image_nc: int
    feature_nc: int
    ngf: int
    img_f: int
    layers: int
    num_block: int
    norm: Optional[str] = "layer"
    slope: float = 0.1

    @nn.compact
    def __call__(self, skips: Sequence[jnp.ndarray], z):
        skips = list(skips)
        out = skips.pop()
        for i in reversed(range(self.layers)):
            in_ch = min(self.ngf * (2 ** (i + 1)), self.img_f)
            out_ch = min(self.ngf * (2 ** i), self.img_f)
            out = FineADAINResBlocks(self.num_block, in_ch, self.slope,
                                     name=f"res{i}")(out, z)
            out = UpBlock2d(out_ch, self.norm, self.slope, name=f"up{i}")(out)
            out = Jump(out_ch, self.norm, self.slope, name=f"jump{i}")(skips.pop()) + out
        return FinalBlock2d(self.image_nc, "tanh", name="final")(out)


class ADAINEncoderBlock(nn.Module):
    """base_blocks.py:195-212 — norm -> act -> conv, downsampling k4 s2."""

    features: int
    feature_nc: int
    slope: float = 0.1

    @nn.compact
    def __call__(self, x, z):
        cin = x.shape[-1]
        x = Conv(self.features, (4, 4), (2, 2), (1, 1), name="conv_0")(
            lrelu(AdaIN(cin, name="norm_0")(x, z), self.slope)
        )
        x = Conv(self.features, (3, 3), (1, 1), (1, 1), name="conv_1")(
            lrelu(AdaIN(self.features, name="norm_1")(x, z), self.slope)
        )
        return x


class ADAINDecoderBlock(nn.Module):
    """base_blocks.py:215-252 with use_transpose=True."""

    features: int
    hidden: int
    feature_nc: int
    slope: float = 0.1

    @nn.compact
    def __call__(self, x, z):
        cin = x.shape[-1]
        x_s = ConvTranspose(self.features, name="conv_s")(
            lrelu(AdaIN(cin, name="norm_s")(x, z), self.slope)
        )
        dx = Conv(self.hidden, (3, 3), (1, 1), (1, 1), name="conv_0")(
            lrelu(AdaIN(cin, name="norm_0")(x, z), self.slope)
        )
        dx = ConvTranspose(self.features, name="conv_1")(
            lrelu(AdaIN(self.hidden, name="norm_1")(dx, z), self.slope)
        )
        return x_s + dx


class ADAINHourglass(nn.Module):
    """base_blocks.py:308-365: 5-down ADAIN encoder + 3-up skip decoder."""

    ngf: int
    img_f: int
    encoder_layers: int
    decoder_layers: int
    feature_nc: int
    slope: float = 0.1

    @nn.compact
    def __call__(self, x, z):
        x = Conv(self.ngf, (7, 7), (1, 1), (3, 3), name="input_layer")(x)
        skips = [x]
        for i in range(self.encoder_layers):
            ch = min(self.ngf * (2 ** (i + 1)), self.img_f)
            x = ADAINEncoderBlock(ch, self.feature_nc, self.slope,
                                  name=f"encoder{i}")(x, z)
            skips.append(x)

        out = skips.pop()
        lo = self.encoder_layers - self.decoder_layers
        for i in reversed(range(lo, self.encoder_layers)):
            out_ch = min(self.ngf * (2 ** i), self.img_f)
            out = ADAINDecoderBlock(out_ch, out_ch, self.feature_nc, self.slope,
                                    name=f"decoder{i}")(out, z)
            out = jnp.concatenate([out, skips.pop()], axis=-1)
        return out


class ResBlockENet(nn.Module):
    """StyleGAN2-style ResBlock with bilinear resample (base_blocks.py:29-49
    == gfpganv1_clean_arch.py:120-149): mode 'down' halves, 'up' doubles."""

    features: int
    mode: str = "down"

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        out_hw = (h // 2, w // 2) if self.mode == "down" else (2 * h, 2 * w)
        out = lrelu(Conv(cin, (3, 3), padding=(1, 1), name="conv1")(x), 0.2)
        out = resize_bilinear(out, out_hw)
        out = lrelu(Conv(self.features, (3, 3), padding=(1, 1), name="conv2")(out), 0.2)
        skip = Conv(self.features, (1, 1), use_bias=False, name="skip")(
            resize_bilinear(x, out_hw)
        )
        return out + skip


class ModulatedConv2d(nn.Module):
    """StyleGAN2 modulated conv (base_blocks.py:460-508).

    TPU-first: instead of the reference's grouped-conv trick (one conv group
    per sample), modulation folds into an input-channel scale and
    demodulation into an output-channel scale around a single shared conv —
    algebraically identical, and it keeps the MXU on one big batched conv.
    """

    features: int
    kernel: int
    num_style_feat: int
    demodulate: bool = True
    sample_mode: Optional[str] = None
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x, style):
        b, h, w, cin = x.shape
        k = self.kernel
        # torch: randn / sqrt(cin * k^2)
        w_init = nn.initializers.normal(stddev=1.0 / (cin * k * k) ** 0.5)
        weight = self.param("weight", w_init, (k, k, cin, self.features))
        # modulation Linear initialized to bias 1 (default_init_weights
        # scale=1, bias_fill=1 — base_blocks.py:480)
        s = Dense(
            cin,
            weight_init=nn.initializers.normal(stddev=self.num_style_feat ** -0.5),
            bias_init=nn.initializers.ones,
            name="modulation",
        )(style.reshape(b, -1))  # [B, Cin]

        # The modulation is a per-(sample, channel) scale and bilinear
        # resize is channelwise-linear, so the mul commutes with the
        # resize exactly — apply it on the SMALLER tensor (the on-chip
        # trace showed the full-res mul materializing a layout copy at
        # HBM speed: tools/out/r5_xplane_mouth_tail2.json copy.1939).
        sc = s[:, None, None, :]
        if self.sample_mode == "upsample":
            x = x * sc.astype(x.dtype)
            x = resize_bilinear(x, (2 * h, 2 * w))
        elif self.sample_mode == "downsample":
            x = resize_bilinear(x, (h // 2, w // 2))
            x = x * sc.astype(x.dtype)
        else:
            x = x * sc.astype(x.dtype)
        out = conv2d(x, weight, padding=k // 2)
        if self.demodulate:
            # demod[b, o] = rsqrt(sum_{khw,i} (w * s)^2)
            w2 = jnp.square(weight).sum(axis=(0, 1))  # [Cin, Cout]
            sig2 = jnp.square(s) @ w2  # [B, Cout]
            demod = jax.lax.rsqrt(sig2 + self.eps)
            out = out * demod[:, None, None, :].astype(out.dtype)
        return out


class StyleConv(nn.Module):
    """base_blocks.py:515-536: modconv * sqrt(2) + noise + bias + lrelu."""

    features: int
    kernel: int
    num_style_feat: int
    demodulate: bool = True
    sample_mode: Optional[str] = None

    @nn.compact
    def __call__(self, x, style, noise: Optional[jnp.ndarray] = None,
                 deterministic: bool = False):
        out = ModulatedConv2d(
            self.features, self.kernel, self.num_style_feat,
            self.demodulate, self.sample_mode, name="modulated_conv",
        )(x, style) * (2.0 ** 0.5)
        nw = self.param("noise_weight", nn.initializers.zeros, (1,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if noise is None:
            if deterministic:
                noise = jnp.zeros(out.shape[:3] + (1,), out.dtype)
            else:
                noise = jax.random.normal(
                    self.make_rng("noise"), out.shape[:3] + (1,), out.dtype
                )
        out = out + nw.astype(out.dtype) * noise
        out = out + bias.astype(out.dtype)
        return lrelu(out, 0.2)


class ToRGB(nn.Module):
    """base_blocks.py:539-554."""

    num_style_feat: int
    upsample: bool = True

    @nn.compact
    def __call__(self, x, style, skip: Optional[jnp.ndarray] = None):
        out = ModulatedConv2d(
            3, 1, self.num_style_feat, demodulate=False, name="modulated_conv"
        )(x, style)
        bias = self.param("bias", nn.initializers.zeros, (3,))
        out = out + bias.astype(out.dtype)
        if skip is not None:
            if self.upsample:
                b, h, w, _ = skip.shape
                skip = resize_bilinear(skip, (2 * h, 2 * w))
            out = out + skip
        return out
