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

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from s2v_tpu.models.layers import AdaIN, BatchNorm2d, Conv, lrelu

# Spatial sizes up to this use matmul-DFTs instead of XLA's FFT: the FFC
# grids are 12..96 px, where tiny FFTs underutilize the TPU while a dense
# [n, n] / [n, 2(n/2+1)] basis matmul rides the MXU and fuses with the
# surrounding 1x1 convs (same trick as the audio frontend's 800-tap STFT).
_MATMUL_FFT_MAX = 128


@functools.lru_cache(maxsize=None)
def _dft_bases(n: int):
    """Returns (F_re, F_im) [n, n] forward DFT and (I_re, I_im) inverse
    bases such that X = F @ x (per axis), x = real(I @ X)."""
    k = np.arange(n)
    ang = -2.0 * np.pi * np.outer(k, k) / n
    f_re = np.cos(ang).astype(np.float32)
    f_im = np.sin(ang).astype(np.float32)
    i_re = (np.cos(-ang) / n).astype(np.float32)
    i_im = (np.sin(-ang) / n).astype(np.float32)
    return f_re, f_im, i_re, i_im


def rfft2_matmul(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B,H,W,C] real -> (re, im) of rfft2 (ortho), [B,H,W//2+1,C] each."""
    b, h, w, c = x.shape
    fh_re, fh_im, _, _ = _dft_bases(h)
    fw_re, fw_im, _, _ = _dft_bases(w)
    wf = w // 2 + 1
    scale = 1.0 / np.sqrt(h * w)  # ortho
    fw_re = jnp.asarray(fw_re[:, :wf] * scale)
    fw_im = jnp.asarray(fw_im[:, :wf] * scale)
    fh_re = jnp.asarray(fh_re)
    fh_im = jnp.asarray(fh_im)
    # W axis first: yw = x @ Fw  (complex from real input)
    yw_re = jnp.einsum("bhwc,wf->bhfc", x, fw_re)
    yw_im = jnp.einsum("bhwc,wf->bhfc", x, fw_im)
    # H axis: y = Fh @ yw (complex x complex)
    y_re = (jnp.einsum("hk,bkfc->bhfc", fh_re, yw_re)
            - jnp.einsum("hk,bkfc->bhfc", fh_im, yw_im))
    y_im = (jnp.einsum("hk,bkfc->bhfc", fh_re, yw_im)
            + jnp.einsum("hk,bkfc->bhfc", fh_im, yw_re))
    return y_re, y_im


def irfft2_matmul(y_re: jnp.ndarray, y_im: jnp.ndarray,
                  h: int, w: int) -> jnp.ndarray:
    """(re, im) half-spectrum [B,H,W//2+1,C] -> real [B,H,W,C] (ortho)."""
    wf = w // 2 + 1
    # torch.fft.irfftn implicitly symmetrizes the half spectrum:
    # X_full[k1, k2] = conj(X[(h - k1) % h, w - k2]) for k2 > w//2 —
    # the ROW index negates too.
    col = np.arange(w)
    keep = col < wf
    mcol = np.where(keep, col, w - col)
    row = np.arange(h)
    mrow = (h - row) % h
    sign = np.where(keep, 1.0, -1.0).astype(np.float32)
    # gather with per-(row, col) source indices
    rr = np.where(keep[None, :], row[:, None], mrow[:, None])  # [h, w]
    full_re = y_re[:, rr, mcol[None, :], :]
    full_im = y_im[:, rr, mcol[None, :], :] * jnp.asarray(sign)[None, None, :, None]

    _, _, ih_re, ih_im = _dft_bases(h)
    _, _, iw_re, iw_im = _dft_bases(w)
    scale = float(np.sqrt(h * w))  # ortho inverse: (1/n/m) * sqrt(nm) net
    ih_re = jnp.asarray(ih_re)
    ih_im = jnp.asarray(ih_im)
    iw_re = jnp.asarray(iw_re * scale)
    iw_im = jnp.asarray(iw_im * scale)
    # H axis inverse
    t_re = (jnp.einsum("hk,bkfc->bhfc", ih_re, full_re)
            - jnp.einsum("hk,bkfc->bhfc", ih_im, full_im))
    t_im = (jnp.einsum("hk,bkfc->bhfc", ih_re, full_im)
            + jnp.einsum("hk,bkfc->bhfc", ih_im, full_re))
    # W axis inverse, keep real part
    out = (jnp.einsum("bhfc,fw->bhwc", t_re, iw_re)
           - jnp.einsum("bhfc,fw->bhwc", t_im, iw_im))
    return out


class FourierUnit(nn.Module):
    """ffc.py:62-126 (no SE, no spectral pos encoding, 2-D, ortho norm)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        orig_dtype = x.dtype
        use_matmul = h <= _MATMUL_FFT_MAX and w <= _MATMUL_FFT_MAX
        xf = x.astype(jnp.float32)
        if use_matmul:
            re, im = rfft2_matmul(xf)
        else:
            ffted = jnp.fft.rfft2(xf, axes=(1, 2), norm="ortho")
            re, im = ffted.real, ffted.imag
        # [B,H,Wf,C] -> [B,H,Wf,2C] real, interleaved (re, im) pairs
        z = jnp.stack([re, im], axis=-1).reshape(b, h, w // 2 + 1, 2 * c)
        z = z.astype(orig_dtype)
        z = Conv(2 * self.features, (1, 1), use_bias=False, name="conv_layer")(z)
        z = BatchNorm2d(2 * self.features, name="bn")(z, train=train)
        z = jax.nn.relu(z)
        z = z.astype(jnp.float32).reshape(b, h, w // 2 + 1, self.features, 2)
        if use_matmul:
            out = irfft2_matmul(z[..., 0], z[..., 1], h, w)
        else:
            zc = jax.lax.complex(z[..., 0], z[..., 1])
            out = jnp.fft.irfft2(zc, s=(h, w), axes=(1, 2), norm="ortho")
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
