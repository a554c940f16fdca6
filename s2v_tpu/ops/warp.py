"""Flow-field warping (DNet's stabilization path).

Replicates the semantics of ``futils/flow_util.py:3-56`` in the reference:
a predicted 2-channel flow field is converted to a normalized deformation
grid and the source image is bilinearly sampled at the deformed coordinates
(torch ``grid_sample`` with its default ``align_corners=False`` and zero
padding).

TPU-first: the sample is expressed as a pair of clipped integer gathers with
in-bounds masks — static shapes, fully vectorized over the frame batch, and
fusible by XLA. (A Pallas version exists in s2v_tpu.ops.pallas for the hot
path; this is the reference implementation both are tested against.)

All arrays are NHWC; flow is [B, H, W, 2] with channel order (dx, dy) to
match the reference's 2-channel conv output (models/DNet.py:77-79).
"""

from __future__ import annotations

import jax.numpy as jnp


def make_coordinate_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """[H, W, 2] grid of (x, y) in [-1, 1] (reference flow_util.py:17-38)."""
    x = jnp.linspace(-1.0, 1.0, w, dtype=dtype)
    y = jnp.linspace(-1.0, 1.0, h, dtype=dtype)
    xx = jnp.broadcast_to(x[None, :], (h, w))
    yy = jnp.broadcast_to(y[:, None], (h, w))
    return jnp.stack([xx, yy], axis=-1)


def convert_flow_to_deformation(flow: jnp.ndarray) -> jnp.ndarray:
    """Pixel-unit flow [B,H,W,2] -> normalized deformation grid [B,H,W,2].

    Reference: flow_util.py:3-15 — flow is scaled by 2/(size-1) per axis and
    added to the identity grid.
    """
    b, h, w, _ = flow.shape
    scale = jnp.asarray([2.0 / (w - 1), 2.0 / (h - 1)], dtype=flow.dtype)
    grid = make_coordinate_grid(h, w, dtype=flow.dtype)
    return grid[None] + flow * scale


def grid_sample_bilinear(image: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """torch ``F.grid_sample(align_corners=False, padding_mode='zeros')``.

    image: [B, H, W, C]; grid: [B, Hg, Wg, 2] with (x, y) in [-1, 1].
    Returns [B, Hg, Wg, C].
    """
    b, h, w, c = image.shape
    gx, gy = grid[..., 0], grid[..., 1]
    # Unnormalize (align_corners=False): ix = ((x + 1) * W - 1) / 2
    ix = ((gx + 1.0) * w - 1.0) * 0.5
    iy = ((gy + 1.0) * h - 1.0) * 0.5

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    ix1 = ix0 + 1.0
    iy1 = iy0 + 1.0
    fx = ix - ix0
    fy = iy - iy0

    def gather(iy_, ix_):
        iyc = jnp.clip(iy_.astype(jnp.int32), 0, h - 1)
        ixc = jnp.clip(ix_.astype(jnp.int32), 0, w - 1)
        flat = image.reshape(b, h * w, c)
        idx = iyc * w + ixc  # [B, Hg, Wg]
        vals = jnp.take_along_axis(
            flat, idx.reshape(b, -1, 1), axis=1
        ).reshape(b, *idx.shape[1:], c)
        inb = (
            (iy_ >= 0) & (iy_ <= h - 1) & (ix_ >= 0) & (ix_ <= w - 1)
        ).astype(image.dtype)
        return vals * inb[..., None]

    v00 = gather(iy0, ix0)
    v01 = gather(iy0, ix1)
    v10 = gather(iy1, ix0)
    v11 = gather(iy1, ix1)

    fx = fx[..., None].astype(image.dtype)
    fy = fy[..., None].astype(image.dtype)
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


def warp_image(source: jnp.ndarray, deformation: jnp.ndarray) -> jnp.ndarray:
    """Warp ``source`` [B,H,W,C] by a deformation grid (flow_util.py:41-56).

    If the deformation resolution differs from the image, it is bilinearly
    upsampled first (the reference predicts flow at 64^2 and warps 256^2).
    """
    from s2v_tpu.ops.image import resize_bilinear

    _, h, w, _ = source.shape
    _, hd, wd, _ = deformation.shape
    if (hd, wd) != (h, w):
        deformation = resize_bilinear(deformation, (h, w))
    return grid_sample_bilinear(source, deformation)


def crop_resize_boxes(images: jnp.ndarray, boxes, out_hw) -> jnp.ndarray:
    """Batched per-frame box crop + bilinear resize via one grid sample.

    images: [N, H, W, C]; boxes: [N, 4] (x1, y1, x2, y2) ints/floats;
    out_hw: static (oh, ow). Equivalent to resizing each crop with torch
    bilinear align_corners=False (edge behavior samples true neighboring
    image pixels instead of clamping at the crop border — sub-pixel
    difference on the outermost ring only).
    """
    import numpy as np

    n, h, w, _ = images.shape
    oh, ow = out_hw
    boxes = jnp.asarray(boxes, jnp.float32)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    tx = (jnp.arange(ow, dtype=jnp.float32) + 0.5) / ow
    ty = (jnp.arange(oh, dtype=jnp.float32) + 0.5) / oh
    sx = x1[:, None] + tx[None, :] * (x2 - x1)[:, None] - 0.5  # [N, ow]
    sy = y1[:, None] + ty[None, :] * (y2 - y1)[:, None] - 0.5  # [N, oh]
    gx = (2.0 * sx + 1.0) / w - 1.0
    gy = (2.0 * sy + 1.0) / h - 1.0
    grid = jnp.stack(
        [jnp.broadcast_to(gx[:, None, :], (n, oh, ow)),
         jnp.broadcast_to(gy[:, :, None], (n, oh, ow))], axis=-1
    )
    return grid_sample_bilinear(images, grid)


def affine_warp(images: jnp.ndarray, mats: jnp.ndarray, out_hw,
                inverse: bool = False) -> jnp.ndarray:
    """Batched ``cv2.warpAffine(src, M, dsize)`` with bilinear sampling.

    images: [N, H, W, C]; mats: [N, 2, 3] affine matrices mapping source
    coords to destination coords (cv2's convention — the matrix is inverted
    internally unless ``inverse=True``, the WARP_INVERSE_MAP analogue where
    ``mats`` already maps destination to source). out_hw: static (oh, ow).

    TPU-first: the sampling grid is built on-device from the 2x3 params via
    broadcasted iota instead of materializing [N, oh, ow, 2] grids on host —
    at 2048^2 output (the GPEN-BFR-2048 final-enhancement crop,
    /root/reference/third_part/GPEN/face_enhancement.py:123) a host grid
    would cost 33 MB/frame of PCIe traffic. Out-of-source samples are zero
    (cv2 BORDER_CONSTANT default).
    """
    n = images.shape[0]
    h, w = images.shape[1], images.shape[2]
    oh, ow = out_hw
    m = jnp.asarray(mats, jnp.float32)
    a00, a01, a02 = m[:, 0, 0], m[:, 0, 1], m[:, 0, 2]
    a10, a11, a12 = m[:, 1, 0], m[:, 1, 1], m[:, 1, 2]
    if not inverse:
        det = a00 * a11 - a01 * a10
        i00, i01 = a11 / det, -a01 / det
        i10, i11 = -a10 / det, a00 / det
        i02 = -(i00 * a02 + i01 * a12)
        i12 = -(i10 * a02 + i11 * a12)
    else:
        i00, i01, i02, i10, i11, i12 = a00, a01, a02, a10, a11, a12
    xs = jnp.arange(ow, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(oh, dtype=jnp.float32)[None, :, None]
    c = lambda v: v[:, None, None]
    sx = c(i00) * xs + c(i01) * ys + c(i02)  # [N, oh, ow]
    sy = c(i10) * xs + c(i11) * ys + c(i12)
    gx = (2.0 * sx + 1.0) / w - 1.0
    gy = (2.0 * sy + 1.0) / h - 1.0
    return grid_sample_bilinear(images, jnp.stack([gx, gy], axis=-1))


def paste_resize_boxes(frames: jnp.ndarray, preds: jnp.ndarray,
                       boxes) -> jnp.ndarray:
    """Batched inverse of crop_resize_boxes: bilinear-resize each pred to its
    box and paste into its frame — one device program instead of a per-frame
    host loop (inference.py:316-330's cv2.resize + slice assignment).

    frames: [N, H, W, C]; preds: [N, s, s, C]; boxes: [N, 4] (x1, y1, x2, y2)
    integer pixel boxes. Outside-box pixels keep the frame values; the resize
    uses half-pixel centers with edge clamping (torch/cv2 semantics).
    """
    n, h, w, c = frames.shape
    s = preds.shape[1]
    boxes = jnp.asarray(boxes, jnp.float32)
    x1, y1 = boxes[:, 0][:, None], boxes[:, 1][:, None]
    x2, y2 = boxes[:, 2][:, None], boxes[:, 3][:, None]

    xs = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5  # pixel centers
    ys = jnp.arange(h, dtype=jnp.float32)[None, :] + 0.5
    # source coords in pred pixels (inverse half-pixel map), edge-clamped
    u = jnp.clip((xs - x1) / jnp.maximum(x2 - x1, 1.0) * s - 0.5, 0.0, s - 1.0)
    v = jnp.clip((ys - y1) / jnp.maximum(y2 - y1, 1.0) * s - 0.5, 0.0, s - 1.0)
    gx = (2.0 * u + 1.0) / s - 1.0  # [N, W]
    gy = (2.0 * v + 1.0) / s - 1.0  # [N, H]
    grid = jnp.stack(
        [jnp.broadcast_to(gx[:, None, :], (n, h, w)),
         jnp.broadcast_to(gy[:, :, None], (n, h, w))], axis=-1
    )
    warped = grid_sample_bilinear(preds, grid)

    in_x = (xs - 0.5 >= x1) & (xs - 0.5 < x2)          # [N, W]
    in_y = (ys - 0.5 >= y1) & (ys - 0.5 < y2)          # [N, H]
    mask = (in_y[:, :, None] & in_x[:, None, :])[..., None]
    return jnp.where(mask, warped, frames)
