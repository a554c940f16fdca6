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
import os
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

IntOrPair = Union[int, Tuple[int, int]]

# --- space-to-depth 3x3 conv (opt-in probe; measured SLOWER on v5e) ----------
# High-resolution stride-1 3x3 convs with few channels (GFPGAN/GPEN condition
# and decoder convs: C=16..64 at 256^2-512^2) run at 5-12% MFU on the MXU
# because the contraction dim (9*C) under-fills the 128-wide systolic array
# (profiled: tools/out/r5_xplane_mouth_tail2.json, condition_scale6_2 at
# 10.6 TFLOP/s). Packing 2x2 spatial blocks into channels turns the 3x3 conv
# into an exactly-equivalent 2x2 conv over 4C -> 4Co channels: each output
# 2x2 block needs a 4x4 input window, which after a +1 row/col shift aligns
# to 2x2 packed blocks. Same per-output dot-product terms (16C taps of which
# 9C nonzero -> 16/9x nominal FLOPs), 4x fuller MXU lanes.
#
# MEASURED ON CHIP (tools/out/r5_s2d_devtime.out vs r5_allknobs3): a LOSS on
# every stage — mouth_tail 13.7 -> 20.0 ms/frame, gpen512_step5 3.6 -> 4.5,
# landmarks_384 1.6 -> 2.4. The pack/unpack transposes break XLA's
# conv+bias+activation fusions, adding full HBM round trips that outweigh
# the MXU fill win. Kept as an opt-in probe (S2V_S2D_CONV=1) with torch
# parity coverage; the direct lowering stays the product path.
_S2D_ENABLE = os.environ.get("S2V_S2D_CONV", "0") == "1"
_S2D_MAX_CIN = 64           # only below MXU lane width does packing pay
_S2D_MIN_PIXELS = 160 * 160  # small outputs: transpose overhead dominates

# M[p,q,r,s,a,b,u,v] = 1 where packed-kernel tap (p,q) at packed-input
# channel block (r,s) contributes original kernel tap (u,v) to packed-output
# channel block (a,b): u = 2p+r-a, v = 2q+s-b, both in [0,2].
_S2D_M = np.zeros((2, 2, 2, 2, 2, 2, 3, 3), np.float32)
for _p in range(2):
    for _q in range(2):
        for _r in range(2):
            for _s in range(2):
                for _a in range(2):
                    for _b in range(2):
                        _u, _v = 2 * _p + _r - _a, 2 * _q + _s - _b
                        if 0 <= _u <= 2 and 0 <= _v <= 2:
                            _S2D_M[_p, _q, _r, _s, _a, _b, _u, _v] = 1.0


def _conv3x3_s2d(x: jnp.ndarray, w: jnp.ndarray,
                 ph: int, pw: int) -> jnp.ndarray:
    """Exact 3x3 stride-1 conv via 2x2-spatial channel packing.

    Preconditions (checked by the caller): H+2ph, W+2pw even and the output
    H+2ph-2, W+2pw-2 even; groups=1, dilation=1.
    """
    B, H, W, C = x.shape
    Co = w.shape[3]
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    He, We = H + 2 * ph, W + 2 * pw
    # pack: [B,He/2,2,We/2,2,C] -> [B,He/2,We/2,(r,s,c)]
    xp = x.reshape(B, He // 2, 2, We // 2, 2, C)
    xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(B, He // 2, We // 2, 4 * C)
    # packed kernel [2,2,(r,s,c),(a,b,co)]
    m = jnp.asarray(_S2D_M, w.dtype)
    w2 = jnp.einsum("pqrsabuv,uvco->pqrscabo", m, w)
    w2 = w2.reshape(2, 2, 4 * C, 4 * Co)
    out = jax.lax.conv_general_dilated(
        xp, w2.astype(x.dtype), window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    Ho, Wo = He - 2, We - 2
    out = out.reshape(B, Ho // 2, Wo // 2, 2, 2, Co)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B, Ho, Wo, Co)
    return out


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
        if (_S2D_ENABLE and groups == 1 and w.shape[:2] == (3, 3)
                and (sh, sw) == (1, 1) and (dh, dw) == (1, 1)
                and pad[0][0] == pad[0][1] and pad[1][0] == pad[1][1]
                and x.shape[3] <= _S2D_MAX_CIN):
            ph, pw = pad[0][0], pad[1][0]
            he, we = x.shape[1] + 2 * ph, x.shape[2] + 2 * pw
            if (he % 2 == 0 and we % 2 == 0 and he >= 4 and we >= 4
                    and (he - 2) * (we - 2) >= _S2D_MIN_PIXELS):
                out = _conv3x3_s2d(x, w, ph, pw)
                if b is not None:
                    out = out + b.astype(out.dtype)
                return out
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
