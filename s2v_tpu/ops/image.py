"""Image primitives with exact PyTorch ``F.interpolate`` semantics, TPU-first.

The reference pipeline leans on ``torch.nn.functional.interpolate`` in dozens
of places (e.g. models/ENet.py:94,104,134; models/base_blocks.py:43-46,123,
500-502; futils/flow_util.py:54). Checkpoint parity requires reproducing its
exact sampling conventions (half-pixel centers, no antialias, legacy-nearest
index math), which differ from ``jax.image.resize`` on downsampling.

TPU-first design: all resizes here are *separable interpolation matmuls*.
Output sizes are static under jit, so the 1-D interpolation weights are
precomputed as numpy constants and the resize becomes two dense matmuls that
run on the MXU — no gathers, no dynamic shapes. A bilinear 512x512 resize is
two [512,512]x[512,...] matmuls, which XLA fuses with surrounding elementwise
work.

All functions take NHWC arrays.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _linear_weights(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] bilinear weights, torch align_corners=False."""
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    src = np.maximum(src, 0.0)  # torch clamps negative source indices to 0
    x0 = np.floor(src).astype(np.int64)
    x0 = np.minimum(x0, in_size - 1)
    x1 = np.minimum(x0 + 1, in_size - 1)
    frac = src - x0
    w = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(w, (rows, x0), (1.0 - frac).astype(np.float32))
    np.add.at(w, (rows, x1), frac.astype(np.float32))
    return w


@functools.lru_cache(maxsize=None)
def _nearest_weights(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] one-hot weights, torch legacy 'nearest' mode."""
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = np.minimum((dst * scale).astype(np.int64), in_size - 1)
    w = np.zeros((out_size, in_size), dtype=np.float32)
    w[np.arange(out_size), src] = 1.0
    return w


def _separable_resize(x: jnp.ndarray, wh: np.ndarray, ww: np.ndarray) -> jnp.ndarray:
    import jax

    dtype = x.dtype
    wh = jnp.asarray(wh, dtype=dtype)
    ww = jnp.asarray(ww, dtype=dtype)
    # f32 inputs keep f32 accumulation (TPU default would drop to bf16);
    # bf16 inputs take the fast MXU path.
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    # [B,H,W,C] -> [B,H',W,C] -> [B,H',W',C]
    x = jnp.einsum("oh,bhwc->bowc", wh, x, precision=prec)
    x = jnp.einsum("pw,bhwc->bhpc", ww, x, precision=prec)
    return x


def resize_bilinear(x: jnp.ndarray, out_hw: tuple) -> jnp.ndarray:
    """torch ``F.interpolate(mode='bilinear', align_corners=False)`` in NHWC.

    Measured-negative (round 5): a fixed-stencil shift-lerp/pair-mean path
    for the exact 2x/0.5x factors — motivated by the trace's layout copies
    around these dots (r5_xplane_mouth_tail3) — ran SLOWER on v5e than the
    interpolation matmuls (mouth_tail 13.7 -> 17.9 ms/frame, step6_enet
    4.4 -> 6.0; tools/out/r5_allknobs5_devtime.out): XLA fuses neighboring
    elementwise work into the dots, and the stack/reshape interleave broke
    those fusions. Keep the matmul lowering.
    """
    h_out, w_out = out_hw
    b, h, w, c = x.shape
    if (h, w) == (h_out, w_out):
        return x
    return _separable_resize(x, _linear_weights(h, h_out), _linear_weights(w, w_out))


def resize_nearest(x: jnp.ndarray, out_hw: tuple) -> jnp.ndarray:
    """torch ``F.interpolate(mode='nearest')`` (legacy index math) in NHWC."""
    h_out, w_out = out_hw
    b, h, w, c = x.shape
    if (h, w) == (h_out, w_out):
        return x
    if h_out % h == 0 and w_out % w == 0:
        # Integer upsample: cheap broadcast instead of matmul.
        fh, fw = h_out // h, w_out // w
        x = jnp.repeat(jnp.repeat(x, fh, axis=1), fw, axis=2)
        return x
    return _separable_resize(x, _nearest_weights(h, h_out), _nearest_weights(w, w_out))


def avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """torch ``nn.AvgPool2d(2)`` for even H, W (NHWC)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(2, 4))


def reflect_pad_2d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """torch ``F.pad(mode='reflect')`` on the spatial dims of NHWC."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def replicate_pad_2d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
