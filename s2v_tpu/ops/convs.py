"""Convolution primitives in NHWC/HWIO with torch parameter conventions.

These are thin wrappers over ``lax.conv_general_dilated`` pinned to the exact
semantics the reference's torch layers use (padding arithmetic, transpose-conv
output_padding, reflect padding mode), so converted checkpoints are
numerically faithful. Layout is NHWC/HWIO — the TPU-native choice.

``kaiming_uniform_init`` reproduces torch's default Conv/Linear init
(kaiming_uniform with a=sqrt(5)) so our own trainings start from the same
distribution family as the reference's.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

IntOrPair = Union[int, Tuple[int, int]]


def _pair(v: IntOrPair) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def kaiming_uniform_init(key, shape, dtype=jnp.float32):
    """torch nn.Conv2d/Linear default weight init for HWIO/[in,out] shapes."""
    if len(shape) == 4:  # HWIO
        fan_in = shape[0] * shape[1] * shape[2]
    elif len(shape) == 3:  # WIO (1-d conv)
        fan_in = shape[0] * shape[1]
    else:  # [in, out] dense
        fan_in = shape[0]
    gain = math.sqrt(2.0 / (1.0 + 5.0))  # leaky_relu gain with a=sqrt(5)
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def bias_uniform_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: IntOrPair = 1,
    padding: Union[IntOrPair, str, Sequence[Tuple[int, int]]] = 0,
    dilation: IntOrPair = 1,
    groups: int = 1,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """x: [B,H,W,Cin]; w: [kh,kw,Cin/groups,Cout] (HWIO). torch Conv2d."""
    sh, sw = _pair(stride)
    dh, dw = _pair(dilation)
    if isinstance(padding, str):
        pad = padding
    else:
        if isinstance(padding, (int, tuple)) and not (
            isinstance(padding, tuple) and isinstance(padding[0], tuple)
        ):
            ph, pw = _pair(padding)
            pad = [(ph, ph), (pw, pw)]
        else:
            pad = [tuple(p) for p in padding]
        if padding_mode != "zeros" and any(p[0] or p[1] for p in pad):
            mode = {"reflect": "reflect", "replicate": "edge"}[padding_mode]
            x = jnp.pad(x, ((0, 0), pad[0], pad[1], (0, 0)), mode=mode)
            pad = [(0, 0), (0, 0)]
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(sh, sw),
        padding=pad,
        rhs_dilation=(dh, dw),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
) -> jnp.ndarray:
    """x: [B,L,Cin]; w: [k,Cin,Cout]. torch Conv1d in NLC layout."""
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv_transpose2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: IntOrPair = 2,
    padding: IntOrPair = 1,
    output_padding: IntOrPair = 1,
) -> jnp.ndarray:
    """torch ConvTranspose2d. w: [kh,kw,Cout,Cin] (torch IOHW transposed to
    HWOI then treated as the *forward* kernel of the gradient conv).

    Implemented as input dilation: insert (s-1) zeros between pixels, pad by
    (k-1-p) left / (k-1-p+op) right, then correlate with the spatially
    flipped kernel.
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    oph, opw = _pair(output_padding)
    kh, kw = w.shape[0], w.shape[1]
    w_flip = jnp.flip(w, axis=(0, 1))  # [kh,kw,Cout,Cin] flipped
    w_flip = jnp.transpose(w_flip, (0, 1, 3, 2))  # HWIO with I=Cin, O=Cout
    out = jax.lax.conv_general_dilated(
        x,
        w_flip.astype(x.dtype),
        window_strides=(1, 1),
        padding=[(kh - 1 - ph, kh - 1 - ph + oph), (kw - 1 - pw, kw - 1 - pw + opw)],
        lhs_dilation=(sh, sw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def dense(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x: [..., in]; w: [in, out]."""
    out = x @ w.astype(x.dtype)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def torch_conv_weight_to_hwio(w_oihw: np.ndarray) -> np.ndarray:
    """torch [O,I,kh,kw] -> HWIO."""
    return np.transpose(w_oihw, (2, 3, 1, 0))


def torch_convtranspose_weight_to_hwoi(w_iohw: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d [I,O,kh,kw] -> [kh,kw,O,I] for conv_transpose2d."""
    return np.transpose(w_iohw, (2, 3, 1, 0))
