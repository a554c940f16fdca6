"""IResNet — the arcface face-recognition backbone (reference:
third_part/face3d/models/arcface_torch/backbones/iresnet.py). Used as:
- the RecogNetWrapper identity-feature extractor (face3d networks.py:107)
- the training.py ArcFaceLoss capability (identity preservation)
- the backbone of the distributed arcface training harness whose classifier
  is s2v_tpu.parallel.partial_fc.

Pre-activation BasicBlocks with PReLU; 112x112 input -> 512-d embedding
through a BN -> flatten -> fc -> feature-BN head.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from s2v_tpu.models.layers import BatchNorm2d, Conv, Dense


class PReLU(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25),
                           (self.features,))
        return jnp.where(x >= 0, x, x * alpha.astype(x.dtype))


class IBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = BatchNorm2d(x.shape[-1], name="bn1")(x, train)
        out = Conv(self.planes, (3, 3), padding=(1, 1), use_bias=False,
                   name="conv1")(out)
        out = BatchNorm2d(self.planes, name="bn2")(out, train)
        out = PReLU(self.planes, name="prelu")(out)
        out = Conv(self.planes, (3, 3), (self.stride, self.stride), (1, 1),
                   use_bias=False, name="conv2")(out)
        out = BatchNorm2d(self.planes, name="bn3")(out, train)
        if self.has_downsample:
            identity = Conv(self.planes, (1, 1), (self.stride, self.stride),
                            use_bias=False, name="downsample_conv")(x)
            identity = BatchNorm2d(self.planes, name="downsample_bn")(identity, train)
        return out + identity


class IResNet(nn.Module):
    """layers=(3,4,14,3) is iresnet50; (2,2,2,2) iresnet18."""

    layers: Sequence[int] = (3, 4, 14, 3)
    num_features: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(64, (3, 3), padding=(1, 1), use_bias=False, name="conv1")(x)
        x = BatchNorm2d(64, name="bn1")(x, train)
        x = PReLU(64, name="prelu")(x)

        planes = 64
        for stage, n_blocks in enumerate(self.layers):
            for b in range(n_blocks):
                stride = 2 if b == 0 else 1
                in_ch = x.shape[-1]
                x = IBasicBlock(
                    planes, stride,
                    has_downsample=(b == 0 and (stride != 1 or in_ch != planes)),
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
            planes *= 2

        x = BatchNorm2d(x.shape[-1], name="bn2")(x, train)
        b = x.shape[0]
        flat = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)  # torch CHW order
        feat = Dense(self.num_features, name="fc")(flat)
        # features BN: 1-D batch norm with frozen unit weight
        weight = self.param("features_weight", nn.initializers.ones,
                            (self.num_features,))
        bias = self.param("features_bias", nn.initializers.zeros,
                          (self.num_features,))
        mean = self.variable("batch_stats", "features_mean",
                             lambda: jnp.zeros(self.num_features))
        var = self.variable("batch_stats", "features_var",
                            lambda: jnp.ones(self.num_features))
        if train:
            m = feat.mean(axis=0)
            v = feat.var(axis=0)
            if not self.is_initializing():
                mean.value = 0.9 * mean.value + 0.1 * m
                n = feat.shape[0]
                var.value = 0.9 * var.value + 0.1 * v * n / max(n - 1, 1)
        else:
            m, v = mean.value, var.value
        inv = jax.lax.rsqrt(v + 1e-5)
        return (feat - m) * inv * weight + bias


# ---------------------------------------------------------------------------
# MobileFaceNet (reference: arcface_torch/backbones/mobilefacenet.py:16-120)
# ---------------------------------------------------------------------------


class _MFConvBlock(nn.Module):
    """mobilefacenet.py ConvBlock: conv(bias=False) + BN + PReLU."""

    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        from s2v_tpu.models.layers import BatchNorm2d, Conv

        x = Conv(self.features, (self.kernel, self.kernel),
                 (self.stride, self.stride), (self.padding, self.padding),
                 use_bias=False, groups=self.groups, name="conv")(x)
        x = BatchNorm2d(self.features, name="bn")(x, train)
        return PReLU(self.features, name="prelu")(x)


class _MFLinearBlock(nn.Module):
    """mobilefacenet.py LinearBlock: conv(bias=False) + BN."""

    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        from s2v_tpu.models.layers import BatchNorm2d, Conv

        x = Conv(self.features, (self.kernel, self.kernel),
                 (self.stride, self.stride), (self.padding, self.padding),
                 use_bias=False, groups=self.groups, name="conv")(x)
        return BatchNorm2d(self.features, name="bn")(x, train)


class _MFDepthWise(nn.Module):
    """mobilefacenet.py DepthWise: 1x1 expand -> depthwise 3x3 -> 1x1 proj."""

    features: int
    groups: int
    stride: int = 2
    residual: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _MFConvBlock(self.groups, name="pw")(x, train)
        h = _MFConvBlock(self.groups, 3, self.stride, 1, groups=self.groups,
                         name="dw")(h, train)
        h = _MFLinearBlock(self.features, name="proj")(h, train)
        return x + h if self.residual else h


class MobileFaceNet(nn.Module):
    """mobilefacenet.py:90-120 (scale 2): 112x112 face -> num_features emb."""

    num_features: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):  # [B, 112, 112, 3]
        from s2v_tpu.models.layers import BatchNorm2d, Conv

        h = _MFConvBlock(128, 3, 2, 1, name="l0")(x, train)
        h = _MFConvBlock(128, 3, 1, 1, groups=64, name="l1")(h, train)
        h = _MFDepthWise(128, 128, name="l2")(h, train)
        for j in range(4):
            h = _MFDepthWise(128, 128, 1, True, name=f"l3_{j}")(h, train)
        h = _MFDepthWise(256, 256, name="l4")(h, train)
        for j in range(6):
            h = _MFDepthWise(256, 256, 1, True, name=f"l5_{j}")(h, train)
        h = _MFDepthWise(256, 512, name="l6")(h, train)
        for j in range(2):
            h = _MFDepthWise(256, 256, 1, True, name=f"l7_{j}")(h, train)
        h = _MFConvBlock(512, name="conv_sep")(h, train)
        # GDC head: depthwise 7x7 linear block -> linear -> BN1d
        h = _MFLinearBlock(512, 7, 1, 0, groups=512, name="gdc_dw")(h, train)
        h = h.reshape(h.shape[0], -1)
        w = self.param("gdc_weight", nn.initializers.normal(0.01),
                       (512, self.num_features))
        h = h @ w
        mean = self.variable("batch_stats", "head_mean",
                             lambda: jnp.zeros((self.num_features,))).value
        var = self.variable("batch_stats", "head_var",
                            lambda: jnp.ones((self.num_features,))).value
        g = self.param("head_weight", nn.initializers.ones,
                       (self.num_features,))
        beta = self.param("head_bias", nn.initializers.zeros,
                          (self.num_features,))
        return (h - mean) * jax.lax.rsqrt(var + 1e-5) * g + beta


# arcface backbones/__init__.py get_model registry (iresnet.py:164-186 layer
# configs + iresnet2060.py:175 + mobilefacenet get_mbf)
_IRESNET_LAYERS = {
    "r18": (2, 2, 2, 2),
    "r34": (3, 4, 6, 3),
    "r50": (3, 4, 14, 3),
    "r100": (3, 13, 30, 3),
    "r200": (6, 26, 60, 6),
    "r2060": (3, 128, 1024 - 128, 3),
}


def get_model(name: str, num_features: int = 512):
    """backbones/__init__.py:5-25: backbone by config name."""
    if name in _IRESNET_LAYERS:
        return IResNet(layers=_IRESNET_LAYERS[name],
                       num_features=num_features)
    if name == "mbf":
        return MobileFaceNet(num_features=num_features)
    raise ValueError(f"unknown backbone {name!r}; "
                     f"options: {sorted(_IRESNET_LAYERS) + ['mbf']}")
