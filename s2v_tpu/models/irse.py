"""IR-SE ArcFace backbone — GPEN's identity-loss network (reference:
third_part/GPEN/training/loss/model_irse.py:10-49 + helpers.py:56-120,
loaded from model_ir_se50.pth by id_loss.py:6-16).

Bottleneck-IR(-SE) residual units over a 112x112 face, BN-heavy stem/head,
l2-normalized 512-d embedding. Inference-mode (frozen running stats,
dropout off) — this net is only ever used frozen as a perceptual identity
metric in the reference.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from s2v_tpu.models.layers import BatchNorm2d, Conv
from s2v_tpu.models.iresnet import PReLU


def _blocks(num_layers: int):
    """helpers.py get_blocks: (in, depth, stride) unit specs."""
    units = {50: (3, 4, 14, 3), 100: (3, 13, 30, 3), 152: (3, 8, 36, 3)}
    if num_layers not in units:
        raise ValueError(f"num_layers must be 50/100/152, got {num_layers}")
    specs = []
    in_ch = 64
    for depth, n in zip((64, 128, 256, 512), units[num_layers]):
        specs.append((in_ch, depth, 2))
        specs.extend((depth, depth, 1) for _ in range(n - 1))
        in_ch = depth
    return specs


class SEModule(nn.Module):
    """helpers.py:56-73: squeeze-excite with reduction 16, biasless 1x1s."""

    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = Conv(self.channels // self.reduction, (1, 1), use_bias=False,
                 name="fc1")(s)
        s = jax.nn.relu(s)
        s = Conv(self.channels, (1, 1), use_bias=False, name="fc2")(s)
        return x * jax.nn.sigmoid(s)


class BottleneckIR(nn.Module):
    """helpers.py bottleneck_IR / bottleneck_IR_SE (:76-120)."""

    in_channel: int
    depth: int
    stride: int
    se: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.in_channel == self.depth:
            # MaxPool2d(1, stride) == stride slicing
            shortcut = x[:, :: self.stride, :: self.stride]
        else:
            shortcut = Conv(self.depth, (1, 1), (self.stride, self.stride),
                            use_bias=False, name="shortcut_conv")(x)
            shortcut = BatchNorm2d(self.depth, name="shortcut_bn")(
                shortcut, train)

        h = BatchNorm2d(self.in_channel, name="bn1")(x, train)
        h = Conv(self.depth, (3, 3), (1, 1), (1, 1), use_bias=False,
                 name="conv1")(h)
        h = PReLU(self.depth, name="prelu")(h)
        h = Conv(self.depth, (3, 3), (self.stride, self.stride), (1, 1),
                 use_bias=False, name="conv2")(h)
        h = BatchNorm2d(self.depth, name="bn2")(h, train)
        if self.se:
            h = SEModule(self.depth, name="se")(h)
        return h + shortcut


class BackboneIRSE(nn.Module):
    """model_irse.py Backbone (input_size 112). mode='ir_se' is the
    model_ir_se50.pth configuration; mode='ir' drops the SE branches."""

    num_layers: int = 50
    mode: str = "ir_se"

    @nn.compact
    def __call__(self, x, train: bool = False):  # [B, 112, 112, 3]
        if x.shape[1:3] != (112, 112) or x.shape[-1] != 3:
            raise ValueError(f"BackboneIRSE expects [B,112,112,3], got {x.shape}")
        h = Conv(64, (3, 3), (1, 1), (1, 1), use_bias=False,
                 name="input_conv")(x)
        h = BatchNorm2d(64, name="input_bn")(h, train)
        h = PReLU(64, name="input_prelu")(h)
        for i, (cin, depth, stride) in enumerate(_blocks(self.num_layers)):
            h = BottleneckIR(cin, depth, stride, se=self.mode == "ir_se",
                             name=f"body{i}")(h, train)
        h = BatchNorm2d(512, name="output_bn")(h, train)
        # dropout is inference-off; torch flattens NCHW-order
        h = jnp.transpose(h, (0, 3, 1, 2)).reshape(h.shape[0], -1)
        w = self.param("linear_weight", nn.initializers.normal(0.01),
                       (h.shape[-1], 512))
        b = self.param("linear_bias", nn.initializers.zeros, (512,))
        h = h @ w + b
        # BatchNorm1d head (affine, running stats)
        mean = self.variable("batch_stats", "head_mean",
                             lambda: jnp.zeros((512,))).value
        var = self.variable("batch_stats", "head_var",
                            lambda: jnp.ones((512,))).value
        g = self.param("head_weight", nn.initializers.ones, (512,))
        beta = self.param("head_bias", nn.initializers.zeros, (512,))
        h = (h - mean) * jax.lax.rsqrt(var + 1e-5) * g + beta
        return h / jnp.linalg.norm(h, axis=1, keepdims=True)


def _adaptive_avg_matrix(n_in: int, n_out: int) -> np.ndarray:
    """torch AdaptiveAvgPool window averaging as a [n_out, n_in] matrix."""
    m = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        a = (i * n_in) // n_out
        b = -(-((i + 1) * n_in) // n_out)
        m[i, a:b] = 1.0 / (b - a)
    return m


def id_loss_feats(variables, images: jnp.ndarray,
                  model: BackboneIRSE = None) -> jnp.ndarray:
    """IDLoss.extract_feats (id_loss.py:18-25): crop the face region of a
    256-multiple square image, adaptive-avg-pool to 112, embed."""
    model = model or BackboneIRSE()
    b, h, w, _ = images.shape
    ss = h // 256
    x = images[:, 35 * ss : h - 33 * ss, 32 * ss : w - 36 * ss]
    my = jnp.asarray(_adaptive_avg_matrix(x.shape[1], 112))
    mx = jnp.asarray(_adaptive_avg_matrix(x.shape[2], 112))
    x = jnp.einsum("oh,bhwc->bowc", my, x)
    x = jnp.einsum("ow,bhwc->bhoc", mx, x)
    return model.apply(variables, x)


def id_loss(variables, y_hat: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """id_loss.py:27-49: mean(1 - <emb(y_hat), emb(y)>), target detached."""
    f_hat = id_loss_feats(variables, y_hat)
    f = jax.lax.stop_gradient(id_loss_feats(variables, y))
    return jnp.mean(1.0 - jnp.sum(f_hat * f, axis=1))
