"""GANimation SplitGenerator — AU-conditioned upper-face expression editing
(reference: third_part/ganimation_replicate/model/model_utils.py:419-482,
driven by GANimationModel in model/ganimation.py:6-58 for --up_face).

Configuration in use: img_nc 3, aus_nc 17, ngf 64, InstanceNorm (no affine),
zero padding, 6 resnet blocks, no dropout. The model predicts a color mask
and an attention (AU) mask; the edited frame is
``aus_mask * src + (1 - aus_mask) * color_mask`` (ganimation.py:52-53).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from s2v_tpu.models.layers import Conv, ConvTranspose
from s2v_tpu.ops.norms import instance_norm_2d

# AU templates for --up_face (futils/inference_utils.py:53-57)
EXP_AUS = {
    "sad": [0.0] * 17,
    "angry": [0, 0, 0.3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    "surprise": [0, 0, 0, 0.2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
}


class ResnetBlock(nn.Module):
    """model_utils.py:209-248 with zero padding."""

    dim: int

    @nn.compact
    def __call__(self, x):
        h = Conv(self.dim, (3, 3), padding=(1, 1), name="conv1")(x)
        h = jax.nn.relu(instance_norm_2d(h))
        h = Conv(self.dim, (3, 3), padding=(1, 1), name="conv2")(h)
        return x + instance_norm_2d(h)


class SplitGenerator(nn.Module):
    """model_utils.py:419-482. Inputs: img [B,128,128,3] in [-1,1],
    aus [B,17]. Returns (color_mask tanh, aus_mask sigmoid, features)."""

    img_nc: int = 3
    aus_nc: int = 17
    ngf: int = 64
    n_blocks: int = 6

    @nn.compact
    def __call__(self, img, aus) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        b, h, w, _ = img.shape
        sparse = jnp.broadcast_to(aus[:, None, None, :], (b, h, w, self.aus_nc))
        x = jnp.concatenate([img, sparse.astype(img.dtype)], axis=-1)

        x = Conv(self.ngf, (7, 7), padding=(3, 3), name="head")(x)
        x = jax.nn.relu(instance_norm_2d(x))
        for i in range(2):
            mult = 2 ** i
            x = Conv(self.ngf * mult * 2, (4, 4), (2, 2), (1, 1),
                     name=f"down{i}")(x)
            x = jax.nn.relu(instance_norm_2d(x))
        for i in range(self.n_blocks):
            x = ResnetBlock(self.ngf * 4, name=f"res{i}")(x)
        for i in range(2):
            mult = 2 ** (2 - i)
            x = ConvTranspose(self.ngf * mult // 2, (4, 4), (2, 2), (1, 1),
                              output_padding=(0, 0), name=f"up{i}")(x)
            x = jax.nn.relu(instance_norm_2d(x))

        color = jnp.tanh(
            Conv(self.img_nc, (7, 7), padding=(3, 3), use_bias=False,
                 name="color_top")(x)
        )
        attention = jax.nn.sigmoid(
            Conv(1, (7, 7), padding=(3, 3), use_bias=False, name="au_top")(x)
        )
        return color, attention, x


def apply_expression(src_img, color_mask, aus_mask):
    """ganimation.py:53: attention composite."""
    return aus_mask * src_img + (1.0 - aus_mask) * color_mask
