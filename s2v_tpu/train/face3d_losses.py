"""Deep3DFaceRecon training losses (reference:
third_part/face3d/models/losses.py:39-113, wired by facerecon_model.py:
feat/color/landmark/reg/gamma/reflectance). With the BFM model and the JAX
rasterizer (s2v_tpu.models.bfm) these complete the face3d training path the
reference runs on nvdiffrast."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

import jax.numpy as jnp


def perceptual_loss(feat_a: jnp.ndarray, feat_b: jnp.ndarray) -> jnp.ndarray:
    """losses.py:39-42: mean (1 - cosine) over the batch (features assumed
    normalized, as the arcface embedder outputs)."""
    cos = jnp.sum(feat_a * feat_b, axis=-1)
    return jnp.sum(1.0 - cos) / cos.shape[0]


def photo_loss(image_a: jnp.ndarray, image_b: jnp.ndarray,
               mask: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """losses.py:45-55. NHWC images in [0,1]; mask [B,H,W,1]."""
    diff = jnp.sqrt(eps + jnp.sum((image_a - image_b) ** 2, axis=-1,
                                  keepdims=True)) * mask
    return jnp.sum(diff) / jnp.maximum(jnp.sum(mask), 1.0)


def landmark_loss(pred_lm: jnp.ndarray, gt_lm: jnp.ndarray,
                  weight: Optional[np.ndarray] = None) -> jnp.ndarray:
    """losses.py:57-73: weighted MSE; nose bridge (28:31) and mouth (-8:)
    weighted 20x."""
    if weight is None:
        weight = np.ones([68])
        weight[28:31] = 20
        weight[-8:] = 20
        weight = weight[None]
    w = jnp.asarray(weight)
    loss = jnp.sum((pred_lm - gt_lm) ** 2, axis=-1) * w
    return jnp.sum(loss) / (pred_lm.shape[0] * pred_lm.shape[1])


def reg_loss(coeffs: Dict[str, jnp.ndarray], w_id: float = 1.0,
             w_exp: float = 1.0, w_tex: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """losses.py:77-99: coefficient L2 + near-monochromatic gamma."""
    creg = (w_id * jnp.sum(coeffs["id"] ** 2)
            + w_exp * jnp.sum(coeffs["exp"] ** 2)
            + w_tex * jnp.sum(coeffs["tex"] ** 2)) / coeffs["id"].shape[0]
    gamma = coeffs["gamma"].reshape(-1, 3, 9)
    gamma_mean = jnp.mean(gamma, axis=1, keepdims=True)
    gamma_loss = jnp.mean((gamma - gamma_mean) ** 2)
    return creg, gamma_loss


def reflectance_loss(texture: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """losses.py:101-113: albedo variance over the skin mask.
    texture [B,N,3]; mask [N]."""
    m = mask.reshape(1, -1, 1)
    mean = jnp.sum(m * texture, axis=1, keepdims=True) / jnp.sum(m)
    return jnp.sum(((texture - mean) * m) ** 2) / (texture.shape[0] * jnp.sum(m))
