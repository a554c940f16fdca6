"""Fused bias + scaled LeakyReLU — Pallas TPU kernel.

TPU-native replacement for the reference's CUDA op
third_part/GPEN/face_model/op/fused_bias_act_kernel.cu (98 LoC): the
StyleGAN2 activation ``scale * leaky_relu(x + bias)`` with slope 0.2 and
scale sqrt(2), used throughout GPEN's generator (gpen_model.py). Forward and
backward are both Pallas kernels wired through jax.custom_vjp; the backward
recomputes the sign from the *output* exactly like the CUDA grad path
(fused_act.py:60-77: grad = scale * g * (1 | slope) by sign(out)).

The elementwise kernel is tiled [rows x C] so arbitrary NHWC shapes stream
through VMEM. An XLA fallback (`fused_bias_leaky_relu_ref`) exists for
testing and for platforms without Mosaic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_bias_leaky_relu_ref(x, bias, negative_slope: float = 0.2,
                              scale: float = 2 ** 0.5):
    """XLA reference (matches GPEN fused_act.py:93-96 CPU fallback)."""
    y = x + bias.astype(x.dtype)
    return scale * jnp.where(y >= 0, y, y * negative_slope)


def _fwd_kernel(x_ref, b_ref, o_ref, *, slope, scale):
    y = x_ref[:] + b_ref[:].astype(x_ref.dtype)
    o_ref[:] = (scale * jnp.where(y >= 0, y, y * slope)).astype(o_ref.dtype)


def _bwd_kernel(g_ref, o_ref, dx_ref, *, slope, scale):
    pos = o_ref[:] >= 0
    dx_ref[:] = (g_ref[:] * scale * jnp.where(pos, 1.0, slope)).astype(dx_ref.dtype)


def _tile_rows(n_rows: int) -> int:
    for t in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if n_rows % t == 0:
            return t
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_bias_leaky_relu(x, bias, negative_slope: float = 0.2,
                          scale: float = 2 ** 0.5):
    """x: [..., C]; bias: [C]. Returns scale * leaky_relu(x + bias)."""
    return _fused_fwd_impl(x, bias, negative_slope, scale)


def _fused_fwd_impl(x, bias, slope, scale):
    shape = x.shape
    c = shape[-1]
    x2 = x.reshape(-1, c)
    n = x2.shape[0]
    tile = _tile_rows(n)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, slope=slope, scale=scale),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
    )(x2, bias.reshape(1, c))
    return out.reshape(shape)


def _fused_fwd(x, bias, slope, scale):
    out = _fused_fwd_impl(x, bias, slope, scale)
    return out, out


def _fused_bwd(slope, scale, out, g):
    shape = g.shape
    c = shape[-1]
    g2 = g.reshape(-1, c)
    o2 = out.reshape(-1, c)
    n = g2.shape[0]
    tile = _tile_rows(n)
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, slope=slope, scale=scale),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), g.dtype),
    )(g2, o2)
    dx = dx.reshape(shape)
    # bias grad: reduce over all non-channel axes (fused_act.py:33-37)
    dbias = dx.sum(axis=tuple(range(dx.ndim - 1))).astype(jnp.float32)
    return dx, dbias


fused_bias_leaky_relu.defvjp(_fused_fwd, _fused_bwd)
