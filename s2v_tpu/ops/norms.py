"""Normalization primitives matching the reference's exact conventions.

- ``layer_norm_chw``: the reference's LayerNorm2d (models/base_blocks.py:52-69)
  normalizes over *all* of (C, H, W) per sample and applies a per-channel
  affine. In NHWC this is a reduction over axes (1, 2, 3).
- ``instance_norm_2d``: torch ``nn.InstanceNorm2d(affine=False)`` — per-(B, C)
  spatial normalization, always using batch statistics (used inside ADAIN,
  base_blocks.py:131).
- ``batch_norm_inference``: frozen-running-stats batch norm for converted
  checkpoints (audio encoder Conv2d blocks, FFC FourierUnit).
"""

from __future__ import annotations

import jax.numpy as jnp


def layer_norm_chw(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """x: [B,H,W,C]; weight/bias: [C]. Normalizes over (H, W, C) jointly."""
    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    var = x.var(axis=(1, 2, 3), keepdims=True)
    inv = jnp.reciprocal(jnp.sqrt(var + eps))
    return (x - mean) * inv * weight + bias


def instance_norm_2d(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """x: [B,H,W,C]. Normalize each (sample, channel) over its H, W."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jnp.reciprocal(jnp.sqrt(var + eps))


def batch_norm_inference(
    x: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """x: [..., C]; stats/affine: [C]."""
    inv = weight * jnp.reciprocal(jnp.sqrt(var + eps))
    return x * inv + (bias - mean * inv)
