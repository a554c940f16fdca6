"""RRDBNet (Real-ESRGAN) — background super-resolution used by GPEN's
RealESRNet (reference: third_part/GPEN/sr_model/rrdbnet_arch.py +
real_esrnet.py; enabled for the BFR-2048 final enhancer with sr_scale=2,
inference.py:228-231).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from s2v_tpu.models.layers import Conv, lrelu
from s2v_tpu.ops.image import resize_nearest


def pixel_unshuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Inverse pixel shuffle, matching torch channel ordering in NHWC:
    out channel index = c * scale^2 + (dy * scale + dx)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // scale, scale, w // scale, scale, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))  # [B, H', W', C, sy, sx]
    return x.reshape(b, h // scale, w // scale, c * scale * scale)


class ResidualDenseBlock(nn.Module):
    num_feat: int = 64
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        def conv(name, feats, inp):
            return Conv(feats, (3, 3), padding=(1, 1), name=name)(inp)

        x1 = lrelu(conv("conv1", self.num_grow_ch, x), 0.2)
        x2 = lrelu(conv("conv2", self.num_grow_ch, jnp.concatenate([x, x1], -1)), 0.2)
        x3 = lrelu(conv("conv3", self.num_grow_ch, jnp.concatenate([x, x1, x2], -1)), 0.2)
        x4 = lrelu(conv("conv4", self.num_grow_ch, jnp.concatenate([x, x1, x2, x3], -1)), 0.2)
        x5 = conv("conv5", self.num_feat, jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    num_feat: int
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, name="rdb1")(x)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, name="rdb2")(out)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, name="rdb3")(out)
        return out * 0.2 + x


class RRDBNet(nn.Module):
    """rrdbnet_arch.py:66-116. Input NHWC in [0, 1]."""

    num_out_ch: int = 3
    scale: int = 4
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        if self.scale == 2:
            feat = pixel_unshuffle(x, 2)
        elif self.scale == 1:
            feat = pixel_unshuffle(x, 4)
        else:
            feat = x
        feat = Conv(self.num_feat, (3, 3), padding=(1, 1), name="conv_first")(feat)
        body = feat
        for i in range(self.num_block):
            body = RRDB(self.num_feat, self.num_grow_ch, name=f"body{i}")(body)
        body = Conv(self.num_feat, (3, 3), padding=(1, 1), name="conv_body")(body)
        feat = feat + body
        b, h, w, c = feat.shape
        feat = lrelu(Conv(self.num_feat, (3, 3), padding=(1, 1), name="conv_up1")(
            resize_nearest(feat, (2 * h, 2 * w))), 0.2)
        b, h, w, c = feat.shape
        feat = lrelu(Conv(self.num_feat, (3, 3), padding=(1, 1), name="conv_up2")(
            resize_nearest(feat, (2 * h, 2 * w))), 0.2)
        feat = lrelu(Conv(self.num_feat, (3, 3), padding=(1, 1), name="conv_hr")(feat), 0.2)
        return Conv(self.num_out_ch, (3, 3), padding=(1, 1), name="conv_last")(feat)


def tile_process(apply_fn, img, scale: int, tile_size: int = 256,
                 tile_pad: int = 10):
    """Tiled super-resolution (reference: sr_model/real_esrnet.py:32-100 —
    crops padded tiles, upscales each, merges). Lets BFR-2048-scale inputs
    stream through fixed-shape jitted programs (every padded tile has the
    same static shape, so one compilation serves all tiles).

    apply_fn: [1, th, tw, 3] -> [1, th*scale, tw*scale, 3]. img: [B, H, W, 3].
    """
    import math

    import numpy as np

    b, h, w, c = img.shape
    out = np.zeros((b, h * scale, w * scale, c), np.float32)
    tiles_x = math.ceil(w / tile_size)
    tiles_y = math.ceil(h / tile_size)
    th = min(tile_size + 2 * tile_pad, h)
    tw = min(tile_size + 2 * tile_pad, w)

    for y in range(tiles_y):
        for x in range(tiles_x):
            sx = x * tile_size
            sy = y * tile_size
            ex = min(sx + tile_size, w)
            ey = min(sy + tile_size, h)
            # padded input window, clamped to the image but with a STATIC
            # (th, tw) shape so the jitted apply compiles once
            py0 = min(max(sy - tile_pad, 0), h - th)
            px0 = min(max(sx - tile_pad, 0), w - tw)
            tile = img[:, py0 : py0 + th, px0 : px0 + tw, :]
            up = np.asarray(apply_fn(tile))
            # position of the output region inside the upscaled tile
            oy = (sy - py0) * scale
            ox = (sx - px0) * scale
            out[:, sy * scale : ey * scale, sx * scale : ex * scale, :] = up[
                :, oy : oy + (ey - sy) * scale, ox : ox + (ex - sx) * scale, :
            ]
    return out


def rrdbnet_arch(variables, scale: int = 4, num_out_ch: int = 3) -> RRDBNet:
    """RRDBNet geometry (num_feat / num_block / num_grow_ch) inferred from
    a variable tree — converted realesrnet checkpoints are the production
    widths (rrdbnet_arch.py:93-101), test fixtures may be narrow. ``scale``
    stays caller-chosen (it changes data layout, not parameter shapes for
    x2 vs x1 pixel-unshuffle variants). Shape-only: eval_shape trees work."""
    try:
        p = variables["params"]
        return RRDBNet(
            num_out_ch=num_out_ch,
            scale=scale,
            num_feat=int(p["conv_first"]["weight"].shape[-1]),
            num_block=sum(1 for k in p
                          if k.startswith("body") and k[4:].isdigit()),
            num_grow_ch=int(
                p["body0"]["rdb1"]["conv1"]["weight"].shape[-1]),
        )
    except (KeyError, TypeError, AttributeError):
        return RRDBNet(scale=scale, num_out_ch=num_out_ch)
