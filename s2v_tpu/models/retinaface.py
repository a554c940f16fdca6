"""RetinaFace — GPEN's face detector (reference:
third_part/GPEN/face_detect/facemodels/retinaface.py + net.py, ResNet50
configuration cfg_re50; detection driver retinaface_detection.py:19-120).

ResNet50 layer2/3/4 -> FPN -> SSH -> 2-anchor class/bbox/landmark heads.
Anchor decode (box_utils.py:209-235 + prior_box.py) is vectorized over all
anchors — the priors are static per input size and fold into the program.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from s2v_tpu.models.layers import BatchNorm2d, Conv, lrelu
from s2v_tpu.models.resnet import ResNet
from s2v_tpu.ops.image import resize_nearest

# cfg_re50 (face_detect/data/config.py:23-40)
MIN_SIZES = ((16, 32), (64, 128), (256, 512))
STEPS = (8, 16, 32)
VARIANCES = (0.1, 0.2)
# BGR means subtracted by the detection driver (retinaface_detection.py)
RETINA_MEAN = (104.0, 117.0, 123.0)


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    leaky: float = 0.0
    relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = Conv(self.features, (self.kernel, self.kernel),
                 (self.stride, self.stride), (pad, pad), use_bias=False,
                 name="conv")(x)
        x = BatchNorm2d(self.features, name="bn")(x, train)
        if self.relu:
            x = lrelu(x, self.leaky) if self.leaky else jax.nn.relu(x)
        return x


class SSH(nn.Module):
    """net.py:40-66."""

    out_channel: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        leaky = 0.1 if self.out_channel <= 64 else 0.0
        c3 = ConvBN(self.out_channel // 2, 3, relu=False, name="conv3X3")(x, train)
        c5_1 = ConvBN(self.out_channel // 4, 3, leaky=leaky, name="conv5X5_1")(x, train)
        c5 = ConvBN(self.out_channel // 4, 3, relu=False, name="conv5X5_2")(c5_1, train)
        c7_2 = ConvBN(self.out_channel // 4, 3, leaky=leaky, name="conv7X7_2")(c5_1, train)
        c7 = ConvBN(self.out_channel // 4, 3, relu=False, name="conv7x7_3")(c7_2, train)
        return jax.nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


class FPN(nn.Module):
    """net.py:68-98."""

    out_channels: int

    @nn.compact
    def __call__(self, feats, train: bool = False):
        leaky = 0.1 if self.out_channels <= 64 else 0.0
        o1 = ConvBN(self.out_channels, 1, leaky=leaky, name="output1")(feats[0], train)
        o2 = ConvBN(self.out_channels, 1, leaky=leaky, name="output2")(feats[1], train)
        o3 = ConvBN(self.out_channels, 1, leaky=leaky, name="output3")(feats[2], train)

        up3 = resize_nearest(o3, o2.shape[1:3])
        o2 = ConvBN(self.out_channels, 3, leaky=leaky, name="merge2")(o2 + up3, train)
        up2 = resize_nearest(o2, o1.shape[1:3])
        o1 = ConvBN(self.out_channels, 3, leaky=leaky, name="merge1")(o1 + up2, train)
        return [o1, o2, o3]


class ConvDW(nn.Module):
    """net.py:29-38 conv_dw: depthwise 3x3 + pointwise 1x1, leaky 0.1."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        x = Conv(cin, (3, 3), (self.stride, self.stride), (1, 1),
                 use_bias=False, groups=cin, name="dw")(x)
        x = BatchNorm2d(cin, name="dw_bn")(x, train)
        x = lrelu(x, 0.1)
        x = Conv(self.features, (1, 1), use_bias=False, name="pw")(x)
        x = BatchNorm2d(self.features, name="pw_bn")(x, train)
        return lrelu(x, 0.1)


class MobileNetV1(nn.Module):
    """net.py:102-137 MobileNetV1 x0.25 — the cfg_mnet backbone. Returns
    the three stage outputs (strides 8/16/32, channels 64/128/256)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(8, 3, 2, leaky=0.1, name="stage1_0")(x, train)
        for i, (f, s) in enumerate([(16, 1), (32, 2), (32, 1),
                                    (64, 2), (64, 1)]):
            x = ConvDW(f, s, name=f"stage1_{i + 1}")(x, train)
        s1 = x
        for i, (f, s) in enumerate([(128, 2)] + [(128, 1)] * 5):
            x = ConvDW(f, s, name=f"stage2_{i}")(x, train)
        s2 = x
        for i, (f, s) in enumerate([(256, 2), (256, 1)]):
            x = ConvDW(f, s, name=f"stage3_{i}")(x, train)
        return s1, s2, x


class RetinaFace(nn.Module):
    """retinaface.py:48-140. Default: ResNet50 / cfg_re50 (out_channel 256,
    2 anchors per position); backbone='mobilenet0.25' selects cfg_mnet
    (out_channel 64, MobileNetV1 x0.25 body — use retinaface_mnet()).
    Input: [B, H, W, 3] BGR mean-subtracted.

    Returns (loc [B, N, 4], conf [B, N, 2] softmaxed, landms [B, N, 10]).
    """

    out_channel: int = 256
    backbone: str = "resnet50"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.backbone == "mobilenet0.25":
            feats_in = list(MobileNetV1(name="body")(x, train))
        else:
            stages = ResNet(return_stages=True, name="body")(x, train)
            feats_in = stages[1:4]
        feats = FPN(self.out_channel, name="fpn")(feats_in, train)
        features = [
            SSH(self.out_channel, name=f"ssh{i + 1}")(f, train)
            for i, f in enumerate(feats)
        ]
        locs, confs, landms = [], [], []
        for i, f in enumerate(features):
            b, h, w, _ = f.shape
            loc = Conv(2 * 4, (1, 1), name=f"BboxHead{i}")(f)
            conf = Conv(2 * 2, (1, 1), name=f"ClassHead{i}")(f)
            ldm = Conv(2 * 10, (1, 1), name=f"LandmarkHead{i}")(f)
            locs.append(loc.reshape(b, h * w * 2, 4))
            confs.append(conf.reshape(b, h * w * 2, 2))
            landms.append(ldm.reshape(b, h * w * 2, 10))
        loc = jnp.concatenate(locs, axis=1)
        conf = jax.nn.softmax(jnp.concatenate(confs, axis=1), axis=-1)
        landms = jnp.concatenate(landms, axis=1)
        return loc, conf, landms


@functools.lru_cache(maxsize=None)
def prior_box(image_hw: Tuple[int, int]) -> np.ndarray:
    """prior_box.py:7-34 for cfg_re50: [N, 4] (cx, cy, w, h) normalized."""
    h, w = image_hw
    anchors = []
    for k, step in enumerate(STEPS):
        fh, fw = math.ceil(h / step), math.ceil(w / step)
        for i in range(fh):
            for j in range(fw):
                for min_size in MIN_SIZES[k]:
                    s_kx = min_size / w
                    s_ky = min_size / h
                    cx = (j + 0.5) * step / w
                    cy = (i + 0.5) * step / h
                    anchors.append([cx, cy, s_kx, s_ky])
    return np.asarray(anchors, np.float32)


def decode_boxes(loc: jnp.ndarray, priors: jnp.ndarray,
                 image_hw: Tuple[int, int]) -> jnp.ndarray:
    """box_utils.py:209-235 decode + scale to pixels. loc [B,N,4]."""
    h, w = image_hw
    pri = priors[None]
    cxcy = pri[..., :2] + loc[..., :2] * VARIANCES[0] * pri[..., 2:]
    wh = pri[..., 2:] * jnp.exp(loc[..., 2:] * VARIANCES[1])
    x1y1 = cxcy - wh / 2
    x2y2 = x1y1 + wh
    boxes = jnp.concatenate([x1y1, x2y2], axis=-1)
    return boxes * jnp.asarray([w, h, w, h], boxes.dtype)


def decode_landms(ldm: jnp.ndarray, priors: jnp.ndarray,
                  image_hw: Tuple[int, int]) -> jnp.ndarray:
    """box_utils.py decode_landm: 5-point landmarks. ldm [B,N,10]."""
    h, w = image_hw
    pri = priors[None]
    pts = []
    for i in range(5):
        p = pri[..., :2] + ldm[..., 2 * i : 2 * i + 2] * VARIANCES[0] * pri[..., 2:]
        pts.append(p * jnp.asarray([w, h], p.dtype))
    return jnp.concatenate(pts, axis=-1)


def detect_faces(outputs, image_hw: Tuple[int, int],
                 confidence_threshold: float = 0.9):
    """Best face per image with its 5 landmarks (what FaceEnhancement
    consumes: retinaface_detection.py + face_enhancement.py:91-120).

    Returns (boxes [B,4] px, landms [B,5,2] px, valid [B])."""
    loc, conf, ldm = outputs
    priors = jnp.asarray(prior_box(image_hw))
    boxes = decode_boxes(loc, priors, image_hw)
    landms = decode_landms(ldm, priors, image_hw)
    scores = conf[..., 1]
    idx = jnp.argmax(scores, axis=1)
    best_box = jnp.take_along_axis(boxes, idx[:, None, None], axis=1)[:, 0]
    best_ldm = jnp.take_along_axis(landms, idx[:, None, None], axis=1)[:, 0]
    best_score = jnp.take_along_axis(scores, idx[:, None], axis=1)[:, 0]
    return best_box, best_ldm.reshape(-1, 5, 2), best_score > confidence_threshold


def retinaface_mnet() -> RetinaFace:
    """cfg_mnet configuration (config.py:3-21): MobileNetV1 x0.25 backbone,
    out_channel 64. Same priors/steps/variances as cfg_re50."""
    return RetinaFace(out_channel=64, backbone="mobilenet0.25")


def retinaface_arch(variables) -> RetinaFace:
    """RetinaFace geometry inferred from a variable tree: picks cfg_re50
    (ResNet50 body, out_channel 256) vs cfg_mnet (MobileNetV1 x0.25,
    out_channel 64) the way the reference loaders pick the cfg per
    checkpoint file (retinaface_detection.py:19-40). Needs only leaf
    *shapes*, so eval_shape trees work. Falls back to cfg_re50."""
    try:
        p = variables["params"]
        backbone = ("mobilenet0.25" if "stage1_0" in p["body"]
                    else "resnet50")
        out_channel = int(p["fpn"]["output1"]["conv"]["weight"].shape[-1])
        return RetinaFace(out_channel=out_channel, backbone=backbone)
    except (KeyError, TypeError, AttributeError):
        return RetinaFace()
