"""ENet — StyleGAN2-style 96->384 enhancer around a frozen LNet
(reference: models/ENet.py).

Forward (ENet.py:82-139):
- style branch: reference crop resized to 256^2 -> 1x1 conv to 256ch ->
  six down ResBlocks to 512ch at 4^2 -> 3x3 conv -> flatten -> linear ->
  512-d style code.
- low-res branch: (masked|reference) resized to 96^2 -> frozen LNet ->
  96^2 lip-synced image.
- super-resolution: reflect-pad 2 -> [StyleConv up, StyleConv, ToRGB] x 2
  (100 -> 200 -> 400) -> center crop 384^2.

Returns (pred_384, low_res_96).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from s2v_tpu.models.layers import (
    Conv,
    Dense,
    ResBlockENet,
    StyleConv,
    ToRGB,
    lrelu,
)
from s2v_tpu.models.lnet import LNet
from s2v_tpu.ops.image import reflect_pad_2d, resize_bilinear

# channels table (ENet.py:22-32); production channel_multiplier=2, narrow=1
def _channels(narrow: float, channel_multiplier: float):
    return {
        4: int(512 * narrow), 8: int(512 * narrow), 16: int(512 * narrow),
        32: int(512 * narrow), 64: int(256 * channel_multiplier * narrow),
        128: int(128 * channel_multiplier * narrow),
        256: int(64 * channel_multiplier * narrow),
        512: int(32 * channel_multiplier * narrow),
        1024: int(16 * channel_multiplier * narrow),
    }


_CHANNELS = _channels(1.0, 2)  # the production table (ENet.py:22-32)


class StyleEncoder(nn.Module):
    """ENet.py:36-49,94-101: reference image -> [B, 1, 512] style code."""

    num_style_feat: int = 512
    channel_multiplier: float = 2
    narrow: float = 1.0

    @nn.compact
    def __call__(self, ref):
        ch = _channels(self.narrow, self.channel_multiplier)
        feat = resize_bilinear(ref, (256, 256))
        feat = lrelu(Conv(ch[128], (1, 1), name="conv_body_first")(feat), 0.2)
        for idx, i in enumerate(range(8, 2, -1)):
            feat = ResBlockENet(ch[2 ** (i - 1)], name=f"conv_body_down{idx}")(feat)
        feat = lrelu(Conv(ch[4], (3, 3), padding=(1, 1), name="final_conv")(feat), 0.2)
        b = feat.shape[0]
        # torch flattens NCHW as [C,H,W]; keep that order for converted
        # final_linear weights.
        flat = jnp.transpose(feat, (0, 3, 1, 2)).reshape(b, -1)
        style = Dense(self.num_style_feat, name="final_linear")(flat)
        return style.reshape(b, 1, self.num_style_feat)


class ENet(nn.Module):
    """ENet.py:8-139. Inputs in NHWC:

    - audio: [B, 80, 16, 1]
    - face:  [B, 384, 384, 6] — (masked crop | reference)
    - gt:    [B, 384, 384, 3] — reference frames (style/identity source)

    Returns (pred [B,384,384,3], low_res [B,96,96,3]).

    ``lnet_res_blocks`` sizes the wrapped LNet decoder (9 = the reference
    production depth; tests use 2 for a slim graph with every layer type).
    ``channel_multiplier``/``narrow`` scale the StyleGAN channel table
    (ENet.py:22-32; production 2/1.0) and ``lnet_base_nc``/``lnet_max_nc``
    the wrapped LNet width — small values give structurally-identical
    test graphs at a fraction of the FLOPs.
    """

    num_style_feat: int = 512
    lnet_res_blocks: int = 9
    channel_multiplier: float = 2
    narrow: float = 1.0
    lnet_base_nc: int = 64
    lnet_max_nc: int = 512

    @nn.compact
    def __call__(self, audio, face, gt, train: bool = False,
                 deterministic: bool = True):
        if face.ndim != 4 or face.shape[-1] != 6:
            raise ValueError(
                f"ENet face must be [B, H, W, 6] (masked|reference), got {face.shape}"
            )
        if gt.shape[:1] != face.shape[:1] or gt.shape[-1] != 3:
            raise ValueError(
                f"ENet gt must be [B, H, W, 3] with matching batch, got {gt.shape}"
            )
        inp, ref = face[..., :3], face[..., 3:]

        style_code = StyleEncoder(self.num_style_feat,
                                  channel_multiplier=self.channel_multiplier,
                                  narrow=self.narrow,
                                  name="style_encoder")(ref)

        lnet_input = jnp.concatenate([inp, gt], axis=-1)
        lnet_input = resize_bilinear(lnet_input, (96, 96))
        low_res_img = LNet(num_res_blocks=self.lnet_res_blocks,
                           base_nc=self.lnet_base_nc,
                           max_nc=self.lnet_max_nc,
                           name="low_res")(audio, lnet_input, train=False)
        # frozen LNet (ENet.py:18-19): block gradients into the low-res branch
        low_res_img = jax.lax.stop_gradient(low_res_img)

        out = reflect_pad_2d(low_res_img, 2)  # 100^2
        skip = out
        channels = _channels(self.narrow, self.channel_multiplier)
        for idx in range(2):  # 100 -> 200 -> 400
            ch = channels[2 ** (7 + idx)]
            out = StyleConv(ch, 3, self.num_style_feat, sample_mode="upsample",
                            name=f"style_conv{2 * idx}")(
                out, style_code, deterministic=deterministic)
            out = StyleConv(ch, 3, self.num_style_feat,
                            name=f"style_conv{2 * idx + 1}")(
                out, style_code, deterministic=deterministic)
            skip = ToRGB(self.num_style_feat, upsample=True,
                         name=f"to_rgb{idx}")(out, style_code, skip)
        pred = skip[:, 8:-8, 8:-8, :]  # 400^2 -> 384^2 (ENet.py:129)
        return pred, low_res_img
