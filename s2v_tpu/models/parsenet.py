"""ParseNet — 19-class face parsing (reference:
third_part/GPEN/face_parse/parse_model.py + blocks.py; orchestrated by
FaceParse in face_parsing.py). The pipeline uses it for the mouth mask in
Step 6 (inference.py:304-308, colormap keeping classes 10/11/12) and for
GPEN's full-face blending mask (face_enhancement.py).

Configuration in use: in/out 512, min_feat 32 (4 down / 4 up), base 64,
channels clipped to [32, 256], 10-block body, BatchNorm + LeakyReLU(0.2).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from s2v_tpu.models.layers import BatchNorm2d, Conv, lrelu
from s2v_tpu.ops.image import resize_nearest


class PConvLayer(nn.Module):
    """blocks.py ConvLayer: [up-nearest] -> reflect pad -> conv[s] -> norm -> relu."""

    features: int
    kernel: int = 3
    scale: str = "none"  # 'none' | 'down' | 'up'
    norm: str = "none"   # 'none' | 'bn'
    relu: str = "none"   # 'none' | 'leakyrelu'

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.scale == "up":
            b, h, w, c = x.shape
            x = resize_nearest(x, (2 * h, 2 * w))
        stride = 2 if self.scale == "down" else 1
        pad = int(np.ceil((self.kernel - 1.0) / 2))
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
        x = Conv(self.features, (self.kernel, self.kernel), (stride, stride),
                 (0, 0), use_bias=(self.norm != "bn"), name="conv2d")(x)
        if self.norm == "bn":
            x = BatchNorm2d(self.features, name="norm")(x, train)
        if self.relu == "leakyrelu":
            x = lrelu(x, 0.2)
        return x


class PResidualBlock(nn.Module):
    """blocks.py ResidualBlock."""

    features: int
    scale: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        if self.scale == "none" and cin == self.features:
            identity = x
        else:
            identity = PConvLayer(self.features, 3, self.scale,
                                  name="shortcut")(x, train)
        conf = {"down": ("none", "down"), "up": ("up", "none"),
                "none": ("none", "none")}[self.scale]
        res = PConvLayer(self.features, 3, conf[0], norm="bn",
                         relu="leakyrelu", name="conv1")(x, train)
        res = PConvLayer(self.features, 3, conf[1], norm="bn",
                         relu="none", name="conv2")(res, train)
        return identity + res


class ParseNet(nn.Module):
    """parse_model.py:22-75 (512-in/512-out configuration)."""

    in_size: int = 512
    out_size: int = 512
    min_feat_size: int = 32
    base_ch: int = 64
    parsing_ch: int = 19
    res_depth: int = 10
    min_ch: int = 32
    max_ch: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        clip = lambda c: max(self.min_ch, min(c, self.max_ch))
        down_steps = int(np.log2(self.in_size // self.min_feat_size))
        up_steps = int(np.log2(self.out_size // self.min_feat_size))

        feat = PConvLayer(self.base_ch, 3, name="encoder0")(x, train)
        head = self.base_ch
        for i in range(down_steps):
            feat = PResidualBlock(clip(head * 2), "down",
                                  name=f"encoder{i + 1}")(feat, train)
            head *= 2

        body = feat
        for i in range(self.res_depth):
            body = PResidualBlock(clip(head), name=f"body{i}")(body, train)
        out = feat + body

        for i in range(up_steps):
            out = PResidualBlock(clip(head // 2), "up",
                                 name=f"decoder{i}")(out, train)
            head //= 2

        out_img = PConvLayer(3, 3, name="out_img_conv")(out, train)
        out_mask = PConvLayer(self.parsing_ch, 3, name="out_mask_conv")(out, train)
        return out_mask, out_img


def parse_mask(logits: jnp.ndarray, colormap: Sequence[float]) -> jnp.ndarray:
    """[B, H, W, 19] logits -> [B, H, W] float mask via per-class colormap
    (face_parsing.py tenor2mask semantics: argmax then idx -> value).

    TPU-first: the table lookup is a one-hot compare-sum over the 19
    classes, not ``cmap[idx]`` — a per-pixel gather at 512^2 x batch ran
    ~8 ms/batch on v5e (tools/out/r5_xplane_gpen512_step5.json, the
    ``parsenet.py`` gather fusion) while the compare-sum fuses into the
    argmax pass. Bit-identical to the gather, ties included (both reduce
    to argmax's first-max-index).
    """
    idx = jnp.argmax(logits, axis=-1)
    cmap = jnp.asarray(colormap, jnp.float32)
    ks = jnp.arange(cmap.shape[0], dtype=idx.dtype)
    return jnp.sum(cmap * (idx[..., None] == ks), axis=-1)


# the Step-6 mouth mask colormap (inference.py:304): mouth/u_lip/l_lip only
MOUTH_COLORMAP = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 255, 255, 255, 0, 0, 0, 0, 0, 0]
# GPEN full-face blending colormap (face_parsing.py:48 default)
FACE_COLORMAP = [0, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 0, 0, 0, 0, 0, 0]


def parsenet_arch(variables) -> "ParseNet":
    """ParseNet geometry inferred from a variable tree — converted
    ParseNet-latest checkpoints are the production widths
    (parse_model.py:22-43), test fixtures may be narrow. The inferred
    min/max channel clips reproduce the observed widths exactly for any
    tree this module produced. Shape-only: eval_shape trees work."""
    try:
        p = variables["params"]

        def width(tree):  # PConvLayer (encoder0) or PResidualBlock
            if "conv2d" in tree:
                return int(tree["conv2d"]["weight"].shape[-1])
            return int(tree["conv2"]["conv2d"]["weight"].shape[-1])

        base_ch = width(p["encoder0"])
        enc_w = [width(v) for k, v in p.items() if k.startswith("encoder")]
        body_w = [width(v) for k, v in p.items() if k.startswith("body")]
        return ParseNet(
            base_ch=base_ch,
            min_ch=min(enc_w),
            max_ch=max(enc_w + body_w),
            res_depth=len(body_w),
            parsing_ch=width(p["out_mask_conv"]),
        )
    except (KeyError, TypeError, AttributeError, ValueError):
        return ParseNet()
