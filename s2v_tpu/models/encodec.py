"""EnCodec-compatible neural audio codec (reference capability:
third_part/emb/qnt.py encode/decode + preprocessing/audio2codes.py — wav to
(n_q, T) discrete codes at 75 Hz via Meta's EnCodec 24 kHz model).

This implements the EnCodec 24 kHz *architecture* in JAX so converted
checkpoints run natively on TPU:

- SEANet encoder: causal weight-norm Conv1d(1->32, k7), four blocks of
  [residual unit (k3 + k1 convs, ELU) -> strided down conv k=2r] with ratios
  (2, 4, 5, 8) and doubling channels, a 2-layer LSTM, and a final k7 conv to
  the 128-d latent. Frame rate 24000 / 320 = 75 Hz.
- Residual vector quantizer: n_q codebooks of 1024 entries quantizing the
  residual in sequence (codes = argmin ||r - c||).
- SEANet decoder (mirror, transposed convs) for decode().

The torch checkpoint stores weight-norm pairs (weight_g, weight_v); the
converter folds them. Without the external weights this module still serves
as a trainable RVQ codec (the protocol expected by prep.tools.audio_to_codes).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

RATIOS = (8, 5, 4, 2)  # encoder downsampling, applied reversed
HOP = int(np.prod(RATIOS))  # 320


def causal_pad(x: jnp.ndarray, kernel: int, stride: int = 1,
               dilation: int = 1) -> jnp.ndarray:
    """EnCodec causal padding: (k-1)*d - (s-1) samples on the left plus the
    right padding needed to cover the last frame (encodec.modules.conv).
    SEANet's pad_mode is *reflect*, matching the torch checkpoints."""
    eff_k = (kernel - 1) * dilation + 1
    pad_total = eff_k - stride
    length = x.shape[1]
    n_frames = (length - eff_k + pad_total) / stride + 1
    ideal = (int(np.ceil(n_frames)) - 1) * stride + eff_k - pad_total
    extra = max(ideal - length, 0)
    if length <= max(pad_total, extra):  # reflect needs pad < length
        x = jnp.pad(x, ((0, 0), (0, max(pad_total, extra) - length + 1), (0, 0)))
    return jnp.pad(x, ((0, 0), (pad_total, extra), (0, 0)), mode="reflect")


class WNConv1d(nn.Module):
    """weight-normalized causal Conv1d (NLC layout)."""

    features: int
    kernel: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        from s2v_tpu.ops.convs import bias_uniform_init, conv1d, kaiming_uniform_init

        cin = x.shape[-1]
        w = self.param("weight", kaiming_uniform_init,
                       (self.kernel, cin, self.features))
        b = self.param("bias", bias_uniform_init(self.kernel * cin),
                       (self.features,))
        x = causal_pad(x, self.kernel, self.stride, self.dilation)
        return conv1d(x, w, b, stride=self.stride, dilation=self.dilation)


class SEANetResnetBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        h = jax.nn.elu(x)
        h = WNConv1d(self.dim // 2, 3, name="conv1")(h)
        h = jax.nn.elu(h)
        h = WNConv1d(self.dim, 1, name="conv2")(h)
        skip = WNConv1d(self.dim, 1, name="shortcut")(x)
        return skip + h


class SEANetEncoder(nn.Module):
    n_filters: int = 32
    dimension: int = 128
    lstm_layers: int = 2

    @nn.compact
    def __call__(self, x):  # [B, T, 1]
        mult = 1
        h = WNConv1d(mult * self.n_filters, 7, name="conv_in")(x)
        for i, ratio in enumerate(reversed(RATIOS)):
            h = SEANetResnetBlock(mult * self.n_filters, name=f"res{i}")(h)
            h = jax.nn.elu(h)
            h = WNConv1d(mult * self.n_filters * 2, ratio * 2, stride=ratio,
                         name=f"down{i}")(h)
            mult *= 2
        # encodec's SLSTM applies the stacked LSTM with a skip connection
        skip = h
        for l in range(self.lstm_layers):
            h = LSTM(mult * self.n_filters, name=f"lstm{l}")(h)
        h = h + skip
        h = jax.nn.elu(h)
        return WNConv1d(self.dimension, 7, name="conv_out")(h)


class LSTM(nn.Module):
    """Unidirectional LSTM matching torch nn.LSTM (single layer) semantics."""

    hidden: int

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        b, t, c = x.shape
        w_ih = self.param("weight_ih", nn.initializers.normal(0.02),
                          (c, 4 * self.hidden))
        w_hh = self.param("weight_hh", nn.initializers.normal(0.02),
                          (self.hidden, 4 * self.hidden))
        b_ih = self.param("bias_ih", nn.initializers.zeros, (4 * self.hidden,))
        b_hh = self.param("bias_hh", nn.initializers.zeros, (4 * self.hidden,))

        def step(carry, xt):
            h, cst = carry
            gates = xt @ w_ih + b_ih + h @ w_hh + b_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            cst = f * cst + i * g
            h = o * jnp.tanh(cst)
            return (h, cst), h

        init = (jnp.zeros((b, self.hidden), x.dtype),
                jnp.zeros((b, self.hidden), x.dtype))
        _, ys = jax.lax.scan(step, init, jnp.swapaxes(x, 0, 1))
        return jnp.swapaxes(ys, 0, 1)


class ResidualVQ(nn.Module):
    """Residual vector quantizer (encodec.quantization.ResidualVectorQuantizer)."""

    n_q: int = 32
    codebook_size: int = 1024
    dimension: int = 128

    @nn.compact
    def __call__(self, z, n_q: Optional[int] = None):
        """z: [B, T, D]. Returns (quantized, codes [B, n_q, T])."""
        n_q = n_q or self.n_q
        codebooks = self.param(
            "codebooks", nn.initializers.normal(1.0),
            (self.n_q, self.codebook_size, self.dimension),
        )
        residual = z
        quantized = jnp.zeros_like(z)
        codes = []
        for q in range(n_q):
            cb = codebooks[q]  # [K, D]
            d2 = (
                jnp.sum(residual * residual, -1, keepdims=True)
                - 2.0 * residual @ cb.T
                + jnp.sum(cb * cb, -1)[None, None, :]
            )
            idx = jnp.argmin(d2, axis=-1)  # [B, T]
            sel = cb[idx]  # [B, T, D]
            quantized = quantized + sel
            residual = residual - sel
            codes.append(idx)
        return quantized, jnp.stack(codes, axis=1)


class SEANetDecoder(nn.Module):
    n_filters: int = 32
    dimension: int = 128
    lstm_layers: int = 2

    @nn.compact
    def __call__(self, z):  # [B, T, D]
        from s2v_tpu.ops.convs import bias_uniform_init, kaiming_uniform_init

        mult = 2 ** len(RATIOS)
        h = WNConv1d(mult * self.n_filters, 7, name="conv_in")(z)
        skip = h
        for l in range(self.lstm_layers):
            h = LSTM(mult * self.n_filters, name=f"lstm{l}")(h)
        h = h + skip
        for i, ratio in enumerate(RATIOS):
            h = jax.nn.elu(h)
            # causal transposed conv k=2r stride r, right-trim
            cin = h.shape[-1]
            feats = mult * self.n_filters // 2
            w = self.param(f"up{i}_weight", kaiming_uniform_init,
                           (ratio * 2, feats, cin))
            b = self.param(f"up{i}_bias", bias_uniform_init(ratio * 2 * cin),
                           (feats,))
            h = jax.lax.conv_general_dilated(
                h, jnp.flip(jnp.swapaxes(w, 1, 2), 0).astype(h.dtype),
                window_strides=(1,), padding=[(ratio * 2 - 1, ratio * 2 - 1)],
                lhs_dilation=(ratio,), dimension_numbers=("NHC", "HIO", "NHC"),
            ) + b
            # trim to causal length T*ratio
            h = h[:, : z.shape[1] * int(np.prod(RATIOS[: i + 1])), :]
            h = SEANetResnetBlock(feats, name=f"res{i}")(h)
            mult //= 2
        h = jax.nn.elu(h)
        return WNConv1d(1, 7, name="conv_out")(h)


class EncodecModel(nn.Module):
    """encode(): wav [B, T, 1] at 24 kHz -> codes [B, n_q, ceil(T/320)]."""

    n_q: int = 32
    sample_rate: int = 24000
    channels: int = 1

    def setup(self):
        self.encoder = SEANetEncoder()
        self.decoder = SEANetDecoder()
        self.quantizer = ResidualVQ(n_q=self.n_q)

    def encode(self, wav, n_q: Optional[int] = None):
        z = self.encoder(wav)
        _, codes = self.quantizer(z, n_q=n_q)
        return codes

    def decode_codes(self, codes):
        """codes [B, n_q, T] -> wav [B, T*320, 1]."""
        codebooks = self.quantizer.get_variable("params", "codebooks")
        if codebooks is None:  # during init
            _ = self.quantizer(jnp.zeros((1, 1, 128)))
            codebooks = self.quantizer.get_variable("params", "codebooks")
        n_q = codes.shape[1]
        z = jnp.zeros(codes.shape[:1] + codes.shape[2:] + (128,))
        for q in range(n_q):
            z = z + codebooks[q][codes[:, q]]
        return self.decoder(z)

    def __call__(self, wav):
        z = self.encoder(wav)
        zq, codes = self.quantizer(z)
        return self.decoder(zq), codes


def frame_codes_per_video_frame(codes: jnp.ndarray) -> Tuple[int, int]:
    """audio2codes.py windows 0.2 s -> 15 code frames at 75 Hz."""
    return codes.shape[1], codes.shape[2]


class JaxEncodecCodec:
    """prep.tools.codec_encode protocol adapter (the `encode_numpy` hook):
    wraps converted EncodecModel variables behind a jitted encoder so
    `audio_to_codes(..., codec=JaxEncodecCodec(variables))` runs natively
    on TPU instead of importing the torch encodec package.
    """

    sample_rate = 24000
    channels = 1

    def __init__(self, variables, n_q: int = 32):
        self._model = EncodecModel(n_q=n_q)
        self._vars = variables
        self._encode = jax.jit(
            lambda v, w: self._model.apply(v, w, method=EncodecModel.encode)
        )

    def encode_numpy(self, chunk: np.ndarray, sr: int) -> np.ndarray:
        """mono [T] at sr -> codes [n_q, T'] at 75 Hz."""
        if sr != self.sample_rate:
            from s2v_tpu.io.audio_io import resample

            chunk = resample(np.asarray(chunk, np.float32), sr,
                             self.sample_rate)
        out = self._encode(self._vars,
                           jnp.asarray(chunk, jnp.float32)[None, :, None])
        return np.asarray(out)[0]
