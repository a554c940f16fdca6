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


class VGG16Features(nn.Module):
    """Returns activations at the reference's four block boundaries."""

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
            if layer_idx in BLOCK_ENDS:
                outs.append(x)
            if layer_idx >= BLOCK_ENDS[-1]:
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


def convert_vgg16_features(sd) -> dict:
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
        if layer_idx >= BLOCK_ENDS[-1]:
            break
    return {"params": params}
