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
    """x: [B,H,W,C]; weight/bias: [C]. Normalizes over (H, W, C) jointly.

    Statistics accumulate in f32 regardless of input dtype — a bf16 mean
    over 384*384*C elements loses ~3 digits otherwise."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2, 3), keepdims=True)
    var = xf.var(axis=(1, 2, 3), keepdims=True)
    inv = jnp.reciprocal(jnp.sqrt(var + eps))
    return ((xf - mean) * inv).astype(x.dtype) * weight + bias


def instance_norm_2d(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """x: [B,H,W,C]. Normalize each (sample, channel) over its H, W.
    Statistics accumulate in f32 (see layer_norm_chw)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = xf.var(axis=(1, 2), keepdims=True)
    return (((xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps)))
            .astype(x.dtype))


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
