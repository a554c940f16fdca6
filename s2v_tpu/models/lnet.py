"""LNet — audio-conditioned 96x96 lip-sync generator (reference: models/LNet.py).

Architecture (LNet.py:80-139):
- Visual_Encoder: two streams (masked input / reference), FirstBlock(7x7) to
  64ch at 96^2, three DownBlocks to 512ch at 12^2, with cross-attention from
  the reference stream at the deepest level (i >= 2) and the reference
  features concatenated at the bottleneck (-> 1024ch).
- audio_encoder: conv stack over the [80, 16] mel window -> 512-d vector
  (LNet.py:102-120).
- Decoder: per level 9 FFC-ADAIN residual blocks conditioned on the audio
  vector, nearest-x2 UpBlock, and a Jump skip; final 7x7 conv + sigmoid
  (LNet.py:46-77).

The reference folds any temporal axis into batch (LNet.py:124-127); here the
batch axis *is* the frame axis, sharded over the mesh's data axis.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from s2v_tpu.models.attention import CrossTransformer
from s2v_tpu.models.ffc import FFCADAINResBlocks
from s2v_tpu.models.layers import (
    ConvBNReLU,
    Conv,
    DownBlock2d,
    FinalBlock2d,
    FirstBlock2d,
    Jump,
    UpBlock2d,
)


class VisualEncoder(nn.Module):
    """LNet.py:10-43."""

    ngf: int = 64
    img_f: int = 512
    layers: int = 3

    @nn.compact
    def __call__(self, inp, ref) -> Sequence[jnp.ndarray]:
        x_inp = FirstBlock2d(self.ngf, name="first_inp")(inp)
        x_ref = FirstBlock2d(self.ngf, name="first_ref")(ref)
        out = [x_inp]
        for i in range(self.layers):
            ch = min(self.ngf * (2 ** (i + 1)), self.img_f)
            x_inp = DownBlock2d(ch, name=f"inp_down{i}")(x_inp)
            x_ref = DownBlock2d(ch, name=f"ref_down{i}")(x_ref)
            if i >= 2:
                x_inp = CrossTransformer(
                    ch, depth=2, heads=4, dim_head=self.ngf,
                    mlp_dim=self.ngf * 4, name=f"ca{i}",
                )(x_inp, x_ref)
            if i < self.layers - 1:
                out.append(x_inp)
            else:
                out.append(jnp.concatenate([x_inp, x_ref], axis=-1))
        return out


class AudioEncoder(nn.Module):
    """LNet.py:102-120: mel [B, 80, 16, 1] -> [B, 512]."""

    descriptor_nc: int = 512

    @nn.compact
    def __call__(self, mel, train: bool = False):
        specs = [
            (32, (1, 1), (1, 1), False), (32, (1, 1), (1, 1), True),
            (32, (1, 1), (1, 1), True),
            (64, (3, 1), (1, 1), False), (64, (1, 1), (1, 1), True),
            (64, (1, 1), (1, 1), True),
            (128, (3, 3), (1, 1), False), (128, (1, 1), (1, 1), True),
            (128, (1, 1), (1, 1), True),
            (256, (3, 2), (1, 1), False), (256, (1, 1), (1, 1), True),
        ]
        x = mel
        for i, (feat, stride, pad, residual) in enumerate(specs):
            x = ConvBNReLU(feat, (3, 3), stride, pad, residual, name=f"conv{i}")(
                x, train=train
            )
        x = ConvBNReLU(512, (3, 3), (1, 1), (0, 0), False, name="conv11")(x, train=train)
        x = ConvBNReLU(self.descriptor_nc, (1, 1), (1, 1), (0, 0), False,
                       name="conv12")(x, train=train)
        return x.reshape(x.shape[0], -1)  # [B, 512]


class Decoder(nn.Module):
    """LNet.py:46-77."""

    image_nc: int = 3
    feature_nc: int = 512
    ngf: int = 64
    img_f: int = 512
    layers: int = 3
    num_block: int = 9

    @nn.compact
    def __call__(self, skips: Sequence[jnp.ndarray], z, train: bool = False):
        skips = list(skips)
        out = skips.pop()
        for i in reversed(range(self.layers)):
            if i == self.layers - 1:
                # bottleneck concat of inp+ref streams (LNet.py:42); clamp to
                # img_f BEFORE doubling so slim test widths stay consistent
                in_ch = min(self.ngf * (2 ** (i + 1)), self.img_f) * 2
            else:
                in_ch = min(self.ngf * (2 ** (i + 1)), self.img_f)
            out_ch = min(self.ngf * (2 ** i), self.img_f)
            out = FFCADAINResBlocks(self.num_block, in_ch, self.feature_nc,
                                    name=f"res{i}")(out, z, train=train)
            out = UpBlock2d(out_ch, name=f"up{i}")(out)
            out = Jump(out_ch, name=f"jump{i}")(skips.pop()) + out
        return FinalBlock2d(self.image_nc, "sigmoid", name="final")(out)


class LNet(nn.Module):
    """LNet.py:80-139. Inputs in NHWC:

    - audio: [B, 80, 16, 1] normalized mel window
    - face:  [B, 96, 96, 6] — (masked crop | reference) stacked on channels

    Returns [B, 96, 96, 3] in [0, 1].
    """

    image_nc: int = 3
    descriptor_nc: int = 512
    layers: int = 3
    base_nc: int = 64
    max_nc: int = 512
    num_res_blocks: int = 9

    @nn.compact
    def __call__(self, audio, face, train: bool = False):
        if audio.ndim != 4 or audio.shape[1:] != (80, 16, 1):
            raise ValueError(
                f"LNet audio must be [B, 80, 16, 1] mel windows, got {audio.shape}"
            )
        if face.ndim != 4 or face.shape[-1] != 2 * self.image_nc:
            raise ValueError(
                f"LNet face must be [B, H, W, {2 * self.image_nc}] "
                f"(masked|reference stacked on channels), got {face.shape}"
            )
        if audio.shape[0] != face.shape[0]:
            raise ValueError(
                f"audio batch {audio.shape[0]} != face batch {face.shape[0]}"
            )
        cropped, ref = face[..., :3], face[..., 3:]
        skips = VisualEncoder(self.base_nc, self.max_nc, self.layers,
                              name="encoder")(cropped, ref)
        audio_feat = AudioEncoder(self.descriptor_nc, name="audio_encoder")(
            audio, train=train
        )
        return Decoder(
            self.image_nc, self.descriptor_nc, self.base_nc, self.max_nc,
            self.layers, self.num_res_blocks, name="decoder",
        )(skips, audio_feat, train=train)
