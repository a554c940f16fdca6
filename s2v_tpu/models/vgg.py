"""VGG16 feature extractor + perceptual loss (reference:
training.py:94-134 VGGPerceptualLoss over torchvision vgg16.features
slices [:4], [4:9], [9:16], [16:23]).

The flax VGG16 mirrors torchvision's `features` layout so pretrained
checkpoints convert directly. The perceptual loss reproduces the reference's
behavior: optional bilinear resize to 224 (normalization is commented out in
the reference — kept that way), L1 between block activations, optional Gram
style terms.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from s2v_tpu.models.layers import Conv
from s2v_tpu.ops.image import resize_bilinear

# torchvision vgg16 features: conv indices within the Sequential
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]
# the reference's block boundaries (layer indices in `features`)
BLOCK_ENDS = (4, 9, 16, 23)


# LPIPS taps (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3)
LPIPS_ENDS = (4, 9, 16, 23, 30)


class VGG16Features(nn.Module):
    """Returns activations at the requested block boundaries (defaults to
    the reference perceptual loss's four; LPIPS uses five)."""

    block_ends: tuple = BLOCK_ENDS

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        outs = []
        layer_idx = 0
        for v in VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
                layer_idx += 1
            else:
                x = Conv(v, (3, 3), padding=(1, 1), name=f"conv{layer_idx}")(x)
                layer_idx += 1
                x = jax.nn.relu(x)
                layer_idx += 1
            if layer_idx in self.block_ends:
                outs.append(x)
            if layer_idx >= self.block_ends[-1]:
                break
        return outs


def vgg_perceptual_loss(
    variables,
    pred: jnp.ndarray,
    target: jnp.ndarray,
    feature_layers: Sequence[int] = (0, 1, 2, 3),
    style_layers: Sequence[int] = (),
    resize: bool = True,
) -> jnp.ndarray:
    """training.py:111-134. pred/target: [B,H,W,3] in [0,1]."""
    model = VGG16Features()
    if resize:
        pred = resize_bilinear(pred, (224, 224))
        target = resize_bilinear(target, (224, 224))
    xs = model.apply(variables, pred)
    ys = model.apply(variables, target)
    loss = 0.0
    for i, (x, y) in enumerate(zip(xs, ys)):
        if i in feature_layers:
            loss = loss + jnp.mean(jnp.abs(x - y))
        if i in style_layers:
            b, h, w, c = x.shape
            ax = x.reshape(b, h * w, c)
            ay = y.reshape(b, h * w, c)
            gx = jnp.einsum("bnc,bnd->bcd", ax, ax)
            gy = jnp.einsum("bnc,bnd->bcd", ay, ay)
            loss = loss + jnp.mean(jnp.abs(gx - gy))
    return loss


def convert_vgg16_features(sd, last_layer: int = BLOCK_ENDS[-1]) -> dict:
    """torchvision vgg16 state_dict ('features.N.weight') -> flax params."""
    import numpy as np

    from s2v_tpu.utils.weights import SDView

    v = SDView(sd, "")
    params = {}
    layer_idx = 0
    for val in VGG16_CFG:
        if val == "M":
            layer_idx += 1
            continue
        name = f"features.{layer_idx}"
        if f"{name}.weight" not in v:
            break
        params[f"conv{layer_idx}"] = v.conv(name)
        layer_idx += 2
        if layer_idx >= last_layer:
            break
    return {"params": params}


# ---------------------------------------------------------------------------
# LPIPS (reference: third_part/GPEN/training/lpips — the validation metric
# of GPEN's trainer, train_simple.py:111-134)
# ---------------------------------------------------------------------------

# LPIPS input scaling (lpips networks: shift/scale in [-1, 1] space)
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def lpips_distance(vgg_variables, lin_weights: List[jnp.ndarray],
                   a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """LPIPS-VGG distance. a, b: [B,H,W,3] in [-1, 1]; lin_weights: five
    [C_i] non-negative per-channel weights (the torch 1x1 'lin' heads)."""
    model = VGG16Features(block_ends=LPIPS_ENDS)

    def prep(x):
        return (x - jnp.asarray(_LPIPS_SHIFT)) / jnp.asarray(_LPIPS_SCALE)

    fa = model.apply(vgg_variables, prep(a))
    fb = model.apply(vgg_variables, prep(b))
    total = 0.0
    for w, xa, xb in zip(lin_weights, fa, fb):
        na = xa * jax.lax.rsqrt(jnp.sum(xa * xa, -1, keepdims=True) + 1e-10)
        nb = xb * jax.lax.rsqrt(jnp.sum(xb * xb, -1, keepdims=True) + 1e-10)
        d2 = jnp.square(na - nb)  # [B,H,W,C]
        total = total + jnp.mean(jnp.sum(d2 * w, axis=-1), axis=(1, 2))
    return total  # [B]


def convert_lpips_lin(sd) -> List[np.ndarray]:
    """lpips checkpoint lin heads ('lin{i}.model.1.weight' [1,C,1,1])."""
    import numpy as np

    return [np.asarray(sd[f"lin{i}.model.1.weight"]).reshape(-1)
            for i in range(5)]
