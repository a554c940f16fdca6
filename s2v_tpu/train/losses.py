"""Training losses (reference: training.py:47-187).

The reference fine-tunes ENet's style convs with a composite loss:
- L1 on the generated 384^2 crop (ENetLoss, training.py:157-187)
- VGG16 perceptual loss (training.py:94-134; disabled at :170)
- "ArcFaceLoss": L2 between face3d 3DMM coefficients of pred and gt
  (training.py:47-92 — the reference code is buggy/WIP; the capability is an
  identity-preservation term)
- adversarial term (left TODO in the reference, training.py:181)

Here: exact L1; a perceptual term computed from multi-scale Laplacian pyramid
features (a self-contained, TPU-friendly stand-in until the VGG weights
converter lands); and an identity hook that accepts any embedding network.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from s2v_tpu.ops.image import avg_pool_2x2, resize_bilinear


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def laplacian_pyramid(x: jnp.ndarray, levels: int = 4):
    """Simple average-pool pyramid of residuals (NHWC)."""
    pyr = []
    cur = x
    for _ in range(levels):
        b, h, w, c = cur.shape
        down = avg_pool_2x2(cur)
        up = resize_bilinear(down, (h, w))
        pyr.append(cur - up)
        cur = down
    pyr.append(cur)
    return pyr


def perceptual_stub(pred: jnp.ndarray, target: jnp.ndarray, levels: int = 4) -> jnp.ndarray:
    """Multi-scale structural loss — placeholder for converted-VGG perceptual."""
    loss = 0.0
    for p, t in zip(laplacian_pyramid(pred, levels), laplacian_pyramid(target, levels)):
        loss = loss + jnp.mean(jnp.abs(p - t))
    return loss / (levels + 1)


def identity_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    embed_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> jnp.ndarray:
    """L2 between identity embeddings (training.py ArcFaceLoss capability)."""
    if embed_fn is None:
        return jnp.asarray(0.0)
    ep = embed_fn(pred)
    et = jax.lax.stop_gradient(embed_fn(target))
    return jnp.mean(jnp.square(ep - et))
