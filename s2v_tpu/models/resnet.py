"""torchvision-convention ResNet (reference: third_part/face3d/models/
networks.py:160-440 — ResNet V1.5 with Bottleneck blocks).

Used as the Deep3DFaceRecon backbone (ResNet50 -> 257 coeff heads) and
reusable for other torchvision-checkpoint models. NHWC; param tree mirrors
torchvision naming (layer{n} / blocks / downsample) for direct conversion.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from s2v_tpu.models.layers import BatchNorm2d, Conv


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = self.planes
        out_ch = self.planes * 4
        identity = x
        out = Conv(width, (1, 1), use_bias=False, name="conv1")(x)
        out = jax.nn.relu(BatchNorm2d(width, name="bn1")(out, train))
        out = Conv(width, (3, 3), (self.stride, self.stride), (1, 1),
                   use_bias=False, name="conv2")(out)
        out = jax.nn.relu(BatchNorm2d(width, name="bn2")(out, train))
        out = Conv(out_ch, (1, 1), use_bias=False, name="conv3")(out)
        out = BatchNorm2d(out_ch, name="bn3")(out, train)
        if self.has_downsample:
            identity = Conv(out_ch, (1, 1), (self.stride, self.stride),
                            use_bias=False, name="downsample_conv")(x)
            identity = BatchNorm2d(out_ch, name="downsample_bn")(identity, train)
        return jax.nn.relu(out + identity)


class ResNet(nn.Module):
    """Bottleneck ResNet; layers=(3,4,6,3) is ResNet50.

    ``return_stages`` yields the per-stage feature maps (layer1..layer4) —
    the FPN inputs RetinaFace taps via IntermediateLayerGetter
    (retinaface.py:73).
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    pool_output: bool = True
    return_stages: bool = False
    base_planes: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.base_planes, (7, 7), (2, 2), (3, 3), use_bias=False,
                 name="conv1")(x)
        x = jax.nn.relu(BatchNorm2d(self.base_planes, name="bn1")(x, train))
        # torch MaxPool2d(3, 2, padding=1): pad with -inf then VALID 3x3 s2
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), (2, 2))

        planes = self.base_planes
        stages = []
        for stage, n_blocks in enumerate(self.layers):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                in_ch = x.shape[-1]
                s = stride if b == 0 else 1
                x = Bottleneck(
                    planes, s, has_downsample=(b == 0 and (s != 1 or in_ch != planes * 4)),
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
            stages.append(x)
            planes *= 2

        if self.return_stages:
            return stages
        if self.pool_output:
            x = x.mean(axis=(1, 2), keepdims=True)  # AdaptiveAvgPool2d(1)
        return x


class ReconNet(nn.Module):
    """Deep3DFaceRecon coefficient regressor (networks.py:69-104):
    ResNet50 -> 7 zero-initialized 1x1 heads -> [B, 257] coeffs in the order
    id(80) | exp(64) | tex(80) | angle(3) | gamma(27) | tx,ty(2) | tz(1).

    Input: [B, 224, 224, 3] RGB in [0, 1].

    ``layers``/``base_planes`` size the ResNet backbone (production =
    ResNet50); small values give structurally-identical test graphs.
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    base_planes: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ResNet(layers=self.layers, base_planes=self.base_planes,
                      name="backbone")(x, train)  # [B,1,1,2048]
        dims = [80, 64, 80, 3, 27, 2, 1]
        outs = []
        for i, d in enumerate(dims):
            head = Conv(d, (1, 1), name=f"head{i}")(feat)
            outs.append(head.reshape(x.shape[0], d))
        return jnp.concatenate(outs, axis=1)


class ResNetDepth(nn.Module):
    """FAN's 3D-landmark depth regressor (reference:
    third_part/face_detection/models.py:204-262): bottleneck ResNet-152
    ([3, 8, 36, 3]) over a 71-channel input (RGB + 68 landmark heatmaps),
    fixed AvgPool2d(7) (NOT adaptive — on a 256^2 input the final 8^2 map is
    pooled over its top-left 7x7 window, reproduced exactly), 68-dim head."""

    num_classes: int = 68

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ResNet(layers=(3, 8, 36, 3), pool_output=False,
                      name="backbone")(x, train)
        feat = nn.avg_pool(feat, (7, 7), (7, 7))  # torch AvgPool2d(7)
        flat = jnp.transpose(feat, (0, 3, 1, 2)).reshape(feat.shape[0], -1)
        w = self.param("fc_weight", nn.initializers.normal(0.01),
                       (flat.shape[-1], self.num_classes))
        b = self.param("fc_bias", nn.initializers.zeros, (self.num_classes,))
        return flat @ w + b
