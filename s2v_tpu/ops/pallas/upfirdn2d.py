"""upfirdn2d (upsample - FIR filter - downsample) — Pallas TPU kernel.

TPU-native replacement for the reference's CUDA op
third_part/GPEN/face_model/op/upfirdn2d_kernel.cu (271 LoC): the StyleGAN2
blur/resampling primitive behind GPEN's Blur / Upsample / Downsample layers
(gpen_model.py:37-99). Semantics follow the reference's python fallback
upfirdn2d_native (op/upfirdn2d.py:162-200):

  1. insert (up-1) zeros after every sample (both axes)
  2. pad by (pad0, pad1) on each axis (negative pads crop)
  3. correlate with the FLIPPED kernel (i.e. convolve with the kernel)
  4. keep every down-th sample

Layout is NHWC (channels on the 128-lane axis). The zero-stuff + pad run in
XLA (cheap, fusible); the FIR + downsample run as a Pallas kernel that tiles
output rows, DMAs the halo'd input rows HBM->VMEM, and accumulates the
(kh x kw <= 16) taps as shifted multiply-adds on the VPU with the stride-
``down`` selection done by reshape — no gathers, no dynamic shapes.

``upfirdn2d(..., use_pallas=False)`` routes to an XLA depthwise-conv
reference used for parity tests and as the fallback for shapes whose rows
don't fit VMEM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stuff_and_pad(x, up: int, pad: Tuple[int, int]):
    """Zero-stuff by ``up`` and apply (possibly negative) pads, both axes."""
    b, h, w, c = x.shape
    if up > 1:
        z = jnp.zeros((b, h, up, w, up, c), x.dtype)
        z = z.at[:, :, 0, :, 0, :].set(x)
        x = z.reshape(b, h * up, w * up, c)
        # torch stuffs (up-1) zeros AFTER each sample; trailing zeros included
    p0, p1 = pad
    x = jnp.pad(x, ((0, 0), (max(p0, 0), max(p1, 0)), (max(p0, 0), max(p1, 0)), (0, 0)))
    if p0 < 0 or p1 < 0:
        hs = max(-p0, 0)
        he = x.shape[1] - max(-p1, 0)
        x = x[:, hs:he, hs:he, :]
    return x


def upfirdn2d_ref(x, kernel, up: int = 1, down: int = 1,
                  pad: Tuple[int, int] = (0, 0)):
    """XLA reference: zero-stuff + pad + depthwise correlation + stride."""
    kernel = jnp.asarray(kernel, x.dtype)
    xp = _stuff_and_pad(x, up, pad)
    c = x.shape[-1]
    # correlate with flipped kernel == convolve with kernel
    w = jnp.flip(kernel, (0, 1))[:, :, None, None]  # [kh,kw,1,1]
    w = jnp.tile(w, (1, 1, 1, c))  # depthwise: O=C, I=1
    return jax.lax.conv_general_dilated(
        xp, w,
        window_strides=(down, down),
        padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _fir_down_kernel(x_ref, o_ref, *, taps, down, tile_oh, w_out, c):
    """One (batch, row-tile): accumulate FIR taps over a halo'd row block.

    x_ref block: [1, 1, bh_pad, wp_pad, c] (halo'd rows pre-gathered in XLA,
    padded to multiples of ``down``); o_ref block: [1, tile_oh, w_out, c].

    VMEM discipline: materialize the down x down phase views ONCE (each is
    1/down^2 of the block), then every tap is a small static slice of its
    phase — peak live intermediates stay ~2 output tiles instead of
    kh*kw halo'd slices.
    """
    kh = len(taps)
    kw = len(taps[0])
    block = x_ref[0, 0]
    bh_pad, wp_pad, _ = block.shape

    if down == 1:
        phases = [[block]]
    else:
        grid = block.reshape(bh_pad // down, down, wp_pad // down, down, c)
        phases = [
            [grid[:, p, :, q, :] for q in range(down)] for p in range(down)
        ]

    acc = jnp.zeros((tile_oh, w_out, c), jnp.float32)
    for i in range(kh):
        for j in range(kw):
            wij = taps[i][j]
            if wij == 0.0:
                continue
            view = phases[i % down][j % down]
            r0, c0 = i // down, j // down
            rows = view[r0 : r0 + tile_oh, c0 : c0 + w_out, :]
            acc = acc + wij * rows.astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _plan_tile_oh(out_h: int, out_w: int, c: int,
                  n_taps: int = 16) -> int | None:
    """Largest row-tile whose Mosaic working set fits scoped VMEM.

    Mosaic hoists the per-tap lane-shifted slice+cast buffers, so in the
    worst case ALL kh*kw tap tiles are live together with the accumulator
    (measured on v5e: out [512,512,64] with 16 taps and tile_oh=8 OOM'd
    the 16 MB scoped stack at ~16 live 1.05 MB tiles). Budget
    (n_taps + 2) live f32 tiles against 14 MB; None -> use the XLA path.
    """
    for t in (16, 8, 4, 2, 1):
        if (out_h % t == 0
                and (n_taps + 2) * t * out_w * c * 4 <= 14 * 1024 * 1024):
            return t
    return None


def upfirdn2d_pallas(x, kernel, up: int = 1, down: int = 1,
                     pad: Tuple[int, int] = (0, 0)):
    kernel = np.asarray(kernel, np.float32)
    kh, kw = kernel.shape
    b, h, w, c = x.shape
    xp = _stuff_and_pad(x, up, pad)
    hp, wp = xp.shape[1], xp.shape[2]
    out_h = (hp - kh) // down + 1
    out_w = (wp - kw) // down + 1

    # Mosaic aborts (tpu_compile_helper exit 1) on halo'd blocks wider
    # than ~2k columns regardless of the VMEM arithmetic — the
    # stride-``down`` phase relayout hits an internal limit somewhere
    # between 1028 and 2052 columns (v5e probe, 2026-08: every
    # 1024-input generator shape compiles and runs; every 2048-input
    # shape aborts). Cap the block width at the known-good bound; the
    # XLA depthwise path takes the >1100-column layers (GPEN-BFR-2048's
    # last two blocks), where XLA's own fusion is already decent.
    tile_oh = (None if wp > 1100
               else _plan_tile_oh(out_h, out_w, c, n_taps=kh * kw))
    if tile_oh is None:
        return upfirdn2d_ref(x, kernel, up, down, pad)
    n_tiles = out_h // tile_oh
    # block height/width padded to multiples of ``down`` for the phase views
    bh = tile_oh * down + kh - 1
    bh = -(-bh // down) * down
    need_cols = (kw - 1) + out_w * down
    need_cols = -(-need_cols // down) * down
    need_rows = (n_tiles - 1) * tile_oh * down + bh
    pad_r = max(need_rows - hp, 0)
    pad_c = max(need_cols - wp, 0)
    if pad_r or pad_c:
        xp = jnp.pad(xp, ((0, 0), (0, pad_r), (0, pad_c), (0, 0)))
    xp = xp[:, :, :need_cols]  # unused tail columns only
    wp = xp.shape[2]

    # Pre-gather halo'd row tiles in XLA: [B, n_tiles, bh, wp, C]. The
    # duplicated halo rows cost (kh-1)/(tile_oh*down) extra HBM traffic and
    # buy fully static, non-overlapping BlockSpecs (no manual DMA).
    starts = np.arange(n_tiles) * tile_oh * down
    idx = starts[:, None] + np.arange(bh)[None, :]  # [n_tiles, bh]
    xt = xp[:, idx]  # [B, n_tiles, bh, wp, C]

    # correlation uses the flipped kernel (matches reference conv2d(flip(k)))
    flipped = kernel[::-1, ::-1]
    taps = tuple(tuple(float(v) for v in row) for row in flipped)

    out = pl.pallas_call(
        functools.partial(
            _fir_down_kernel, taps=taps, down=down,
            tile_oh=tile_oh, w_out=out_w, c=c,
        ),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 1, bh, wp, c), lambda bi, ti: (bi, ti, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, tile_oh, out_w, c), lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, out_h, out_w, c), x.dtype),
    )(xt)
    return out


def upfirdn2d(x, kernel, up: int = 1, down: int = 1,
              pad: Tuple[int, int] = (0, 0),
              use_pallas: bool | None = None):
    """NHWC upfirdn2d with the reference op's exact semantics.

    ``use_pallas=None`` (the default) routes to the XLA depthwise path on
    every platform: measured on v5e (batch 16, carry-chained, 2026-08),
    XLA's fused zero-stuff/pad/depthwise-conv chain beats the hand Pallas
    kernel ~6x at every StyleGAN shape probed (512^2 x32: 0.53 vs
    3.42 ms/frame; 256^2 x64 up2: 0.61 vs 3.60) and Mosaic aborts
    outright on blocks wider than ~1k columns (GPEN-BFR-2048's upper
    layers). The kernel below is kept as the explicit-opt-in
    (``use_pallas=True``) reference implementation of the CUDA op and for
    future toolchains where the tradeoff may flip; ``False`` forces the
    XLA path unconditionally.
    """
    on_tpu = jax.default_backend() not in ("cpu",)
    if use_pallas and on_tpu:
        return upfirdn2d_pallas(x, kernel, up, down, pad)
    return upfirdn2d_ref(x, kernel, up, down, pad)
