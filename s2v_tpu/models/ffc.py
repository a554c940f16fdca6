"""Fast Fourier Convolution blocks (reference: models/ffc.py, LaMa-style).

LNet's decoder runs 27 FFC-ADAIN residual blocks (models/LNet.py:57,
base_blocks.py:389-426) with ratio_gin = ratio_gout = 0.75 and LFU disabled
(base_blocks.py:375-377 passes enable_lfu=False). Only that configuration is
implemented; the channel split is [local = C/4 | global = 3C/4], matching
``x[:, :-global_in_num]`` / ``x[:, -global_in_num:]`` in the reference.

The spectral path (FourierUnit) is rfft2 -> 1x1 conv on stacked (re, im)
channels -> irfft2 with 'ortho' norm (ffc.py:89-126). Real/imag channels are
interleaved per source channel ([c0_re, c0_im, c1_re, ...]) exactly as the
reference's stack+permute+view produces, so converted 1x1-conv weights apply
unchanged. XLA lowers the fixed-size 2-D FFTs (12/24/48 spatial) natively on
TPU; the 1x1 convs are MXU matmuls.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from s2v_tpu.models.layers import AdaIN, BatchNorm2d, Conv, lrelu


class FourierUnit(nn.Module):
    """ffc.py:62-126 (no SE, no spectral pos encoding, 2-D, ortho norm)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        orig_dtype = x.dtype
        # TPU FFT runs in f32; bf16 inputs are upcast around the spectral op.
        ffted = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm="ortho")
        # [B,H,Wf,C] complex -> [B,H,Wf,2C] real, interleaved (re, im) pairs
        z = jnp.stack([ffted.real, ffted.imag], axis=-1).reshape(b, h, w // 2 + 1, 2 * c)
        z = z.astype(orig_dtype)
        z = Conv(2 * self.features, (1, 1), use_bias=False, name="conv_layer")(z)
        z = BatchNorm2d(2 * self.features, name="bn")(z, train=train)
        z = jax.nn.relu(z)
        z = z.astype(jnp.float32).reshape(b, h, w // 2 + 1, self.features, 2)
        z = jax.lax.complex(z[..., 0], z[..., 1])
        out = jnp.fft.irfft2(z, s=(h, w), axes=(1, 2), norm="ortho")
        return out.astype(orig_dtype)


class SpectralTransform(nn.Module):
    """ffc.py:129-173 with stride 1 and enable_lfu=False."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.features // 2
        x = Conv(half, (1, 1), use_bias=False, name="conv1")(x)
        x = BatchNorm2d(half, name="conv1_bn")(x, train=train)
        x = jax.nn.relu(x)
        out = FourierUnit(half, name="fu")(x, train=train)
        return Conv(self.features, (1, 1), use_bias=False, name="conv2")(x + out)


class FFC(nn.Module):
    """ffc.py:176-232: local/global two-stream conv, ratio 0.75, ungated."""

    features: int
    ratio_gin: float = 0.75
    ratio_gout: float = 0.75

    @nn.compact
    def __call__(self, x_l, x_g, train: bool = False):
        out_cg = int(self.features * self.ratio_gout)
        out_cl = self.features - out_cg
        conv_kw = dict(kernel=(3, 3), padding=(1, 1), use_bias=False,
                       padding_mode="reflect")
        out_xl = (
            Conv(out_cl, name="convl2l", **conv_kw)(x_l)
            + Conv(out_cl, name="convg2l", **conv_kw)(x_g)
        )
        out_xg = (
            Conv(out_cg, name="convl2g", **conv_kw)(x_l)
            + SpectralTransform(out_cg, name="convg2g")(x_g, train=train)
        )
        return out_xl, out_xg


class FineADAINLama(nn.Module):
    """base_blocks.py:368-386: FFC + per-stream ADAIN(z) + leaky relu.

    Slope quirk: FFCADAINResBlocks passes (norm_layer, nonlinearity,
    use_spect) positionally into FFCResnetBlock's unrelated signature
    (base_blocks.py:419 vs :390), so FineADAINLama is constructed with its
    *default* nonlinearity nn.LeakyReLU() — slope 0.01, not the 0.1 used
    elsewhere. Checkpoints were trained with 0.01; we match it.
    """

    features: int
    feature_nc: int
    ratio: float = 0.75
    slope: float = 0.01

    @nn.compact
    def __call__(self, x_l, x_g, z, train: bool = False):
        global_ch = int(self.features * self.ratio)
        local_ch = self.features - global_ch
        x_l, x_g = FFC(self.features, self.ratio, self.ratio, name="ffc")(
            x_l, x_g, train=train
        )
        x_l = lrelu(AdaIN(local_ch, name="bn_l")(x_l, z), self.slope)
        x_g = lrelu(AdaIN(global_ch, name="bn_g")(x_g, z), self.slope)
        return x_l, x_g


class FFCResnetBlock(nn.Module):
    """base_blocks.py:389-411 (inline=True): split -> 2x FineADAINLama ->
    residual -> concat."""

    features: int
    feature_nc: int
    ratio: float = 0.75

    @nn.compact
    def __call__(self, x, z, train: bool = False):
        global_ch = int(self.features * self.ratio)
        x_l, x_g = x[..., : self.features - global_ch], x[..., self.features - global_ch :]
        id_l, id_g = x_l, x_g
        x_l, x_g = FineADAINLama(self.features, self.feature_nc, self.ratio,
                                 name="conv1")(x_l, x_g, z, train=train)
        x_l, x_g = FineADAINLama(self.features, self.feature_nc, self.ratio,
                                 name="conv2")(x_l, x_g, z, train=train)
        return jnp.concatenate([id_l + x_l, id_g + x_g], axis=-1)


class FFCADAINResBlocks(nn.Module):
    """base_blocks.py:414-426: a stack of FFC residual blocks."""

    num_block: int
    features: int
    feature_nc: int

    @nn.compact
    def __call__(self, x, z, train: bool = False):
        for i in range(self.num_block):
            x = FFCResnetBlock(self.features, self.feature_nc, name=f"res{i}")(
                x, z, train=train
            )
        return x
