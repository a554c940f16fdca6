"""Face alignment geometry (reference: futils/ffhq_preprocess.py and
futils/alignment_stit.py).

The reference aligns with dlib + PIL on the host, one frame at a time. Here
the geometry (FFHQ oriented quad from 68 landmarks, 8-param homography
solve) stays in numpy — it's a handful of floats per frame — while the image
resampling (PIL QUAD / PERSPECTIVE transforms) becomes batched bilinear
gathers on device via grid_sample.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp

from s2v_tpu.ops.warp import grid_sample_bilinear


def compute_transform(lm: np.ndarray, scale: float = 1.0):
    """68-landmark FFHQ oriented rectangle (alignment_stit.py:116-146 ==
    ffhq_preprocess.py:57-89). Returns (c, x, y)."""
    lm_eye_left = lm[36:42]
    lm_eye_right = lm[42:48]
    lm_mouth_outer = lm[48:60]

    eye_left = np.mean(lm_eye_left, axis=0)
    eye_right = np.mean(lm_eye_right, axis=0)
    eye_avg = (eye_left + eye_right) * 0.5
    eye_to_eye = eye_right - eye_left
    mouth_avg = (lm_mouth_outer[0] + lm_mouth_outer[6]) * 0.5
    eye_to_mouth = mouth_avg - eye_avg

    x = eye_to_eye - np.flipud(eye_to_mouth) * [-1, 1]
    x /= np.hypot(*x)
    x *= max(np.hypot(*eye_to_eye) * 2.0, np.hypot(*eye_to_mouth) * 1.8)
    x *= scale
    y = np.flipud(x) * [-1, 1]
    c = eye_avg + eye_to_mouth * 0.1
    return c, x, y


def quad_from_cxy(c, x, y) -> np.ndarray:
    return np.stack([c - x - y, c - x + y, c + x + y, c + x - y])


def ffhq_crop_box(lm: np.ndarray, image_size: Tuple[int, int],
                  output_size: int = 512):
    """First-frame FFHQ crop (ffhq_preprocess.py:57-116 align_face, shrink
    branch omitted as in practice qsize < 2*output_size for the pipeline's
    inputs). Returns (crop, quad) where crop=(clx, cly, crx, cry) and
    quad=[lx, ly, rx, ry] floats, exactly the values main() combines into
    oy1..ox2 (inference.py:90 semantics via facing.py).
    """
    w, h = image_size
    c, x, y = compute_transform(lm)
    quad = quad_from_cxy(c, x, y)
    qsize = np.hypot(*x) * 2

    border = max(int(np.rint(qsize * 0.1)), 3)
    crop = (
        int(np.floor(min(quad[:, 0]))), int(np.floor(min(quad[:, 1]))),
        int(np.ceil(max(quad[:, 0]))), int(np.ceil(max(quad[:, 1]))),
    )
    crop = (
        max(crop[0] - border, 0), max(crop[1] - border, 0),
        min(crop[2] + border, w), min(crop[3] + border, h),
    )
    if crop[2] - crop[0] < w or crop[3] - crop[1] < h:
        quad -= crop[0:2]

    q = (quad + 0.5).flatten()
    lx = max(min(q[0], q[2]), 0)
    ly = max(min(q[1], q[7]), 0)
    rx = min(max(q[4], q[6]), w)
    ry = min(max(q[3], q[5]), w)  # reference uses img.size[0] here too
    return crop, [lx, ly, rx, ry]


def crop_quad_params(quad: np.ndarray, image_size: Tuple[int, int],
                     output_size: int):
    """The crop+quad adjustment from crop_image (alignment_stit.py:68-114,
    padding disabled as in the pipeline). Returns (crop_box, adjusted_quad)
    where the final resample maps adjusted_quad (+0.5) in the cropped image
    to the output square."""
    w, h = image_size
    quad = quad.copy()
    x = (quad[3] - quad[1]) / 2
    qsize = np.hypot(*x) * 2
    border = max(int(np.rint(qsize * 0.1)), 3)
    crop = (
        int(np.floor(min(quad[:, 0]))), int(np.floor(min(quad[:, 1]))),
        int(np.ceil(max(quad[:, 0]))), int(np.ceil(max(quad[:, 1]))),
    )
    crop = (
        max(crop[0] - border, 0), max(crop[1] - border, 0),
        min(crop[2] + border, w), min(crop[3] + border, h),
    )
    if crop[2] - crop[0] < w or crop[3] - crop[1] < h:
        quad -= crop[0:2]
    else:
        crop = (0, 0, w, h)
    return crop, quad + 0.5


def quad_sample_grid(quad: np.ndarray, out_size: int,
                     src_hw: Tuple[int, int]) -> np.ndarray:
    """Sampling grid for PIL Image.transform(QUAD): output (x, y) samples
    the source at the bilinear interpolation of the quad corners
    (nw, sw, se, ne ordering, PIL convention). Returns [out, out, 2] in
    grid_sample's normalized coords (align_corners=False)."""
    nw, sw, se, ne = quad[0], quad[1], quad[2], quad[3]
    t = (np.arange(out_size) + 0.5) / out_size  # pixel centers in [0,1]
    tx = t[None, :, None]  # along width
    ty = t[:, None, None]  # along height
    top = nw[None, None, :] + tx * (ne - nw)[None, None, :]
    bot = sw[None, None, :] + tx * (se - sw)[None, None, :]
    src = top + ty * (bot - top)  # [out, out, 2] source pixel coords
    h, w = src_hw
    gx = 2.0 * src[..., 0] / w - 1.0
    gy = 2.0 * src[..., 1] / h - 1.0
    return np.stack([gx, gy], axis=-1).astype(np.float32)


def calc_alignment_coefficients(pa, pb) -> np.ndarray:
    """8-param perspective solve mapping pb -> pa (alignment_stit.py:199-209).

    PIL convention: transform(size, PERSPECTIVE, coeffs) samples the source
    at ((a x + b y + c) / (g x + h y + 1), (d x + e y + f) / (...)) for each
    output (x, y)."""
    matrix = []
    for p1, p2 in zip(pa, pb):
        matrix.append([p1[0], p1[1], 1, 0, 0, 0, -p2[0] * p1[0], -p2[0] * p1[1]])
        matrix.append([0, 0, 0, p1[0], p1[1], 1, -p2[1] * p1[0], -p2[1] * p1[1]])
    a = np.asarray(matrix, dtype=np.float64)
    b = np.asarray(pb, dtype=np.float64).reshape(8)
    res = np.linalg.solve(a.T @ a, a.T @ b)
    return res.reshape(8)


def perspective_sample_grid(coeffs: np.ndarray, out_hw: Tuple[int, int],
                            src_hw: Tuple[int, int]) -> np.ndarray:
    """Sampling grid for PIL Image.transform(PERSPECTIVE, coeffs)."""
    a, b, c, d, e, f, g, h = [float(v) for v in coeffs]
    oh, ow = out_hw
    # PIL evaluates the transform at output pixel centers and samples the
    # source at (xin - 0.5, yin - 0.5) in index space (ImagingGenericTransform)
    xs = np.arange(ow, dtype=np.float64)[None, :] + 0.5
    ys = np.arange(oh, dtype=np.float64)[:, None] + 0.5
    denom = g * xs + h * ys + 1.0
    sx = (a * xs + b * ys + c) / denom
    sy = (d * xs + e * ys + f) / denom
    sh, sw = src_hw
    gx = 2.0 * sx / sw - 1.0
    gy = 2.0 * sy / sh - 1.0
    return np.stack(np.broadcast_arrays(gx, gy), axis=-1).astype(np.float32)


def quad_grids_batched(quads: jnp.ndarray, out_size: int,
                       src_hw: Tuple[int, int]) -> jnp.ndarray:
    """Device-side batched ``quad_sample_grid``: quads [N, 4, 2] (nw, sw, se,
    ne in source pixel coords) -> [N, out, out, 2] normalized grids.

    TPU-first: the host ships 8 floats per frame instead of a 256^2 grid
    (0.5 MB/frame of PCIe/relay traffic); the grid itself is built on-device
    from broadcasted iota."""
    quads = jnp.asarray(quads, jnp.float32)
    nw, sw, se, ne = quads[:, 0], quads[:, 1], quads[:, 2], quads[:, 3]
    t = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size
    tx = t[None, None, :, None]  # along width
    ty = t[None, :, None, None]  # along height
    c = lambda v: v[:, None, None, :]
    top = c(nw) + tx * c(ne - nw)
    bot = c(sw) + tx * c(se - sw)
    src = top + ty * (bot - top)  # [N, out, out, 2] source pixel coords
    h, w = src_hw
    gx = 2.0 * src[..., 0] / w - 1.0
    gy = 2.0 * src[..., 1] / h - 1.0
    return jnp.stack([gx, gy], axis=-1)


def perspective_grids_batched(coeffs: jnp.ndarray, out_hw: Tuple[int, int],
                              src_hw: Tuple[int, int]) -> jnp.ndarray:
    """Device-side batched ``perspective_sample_grid``: coeffs [N, 8] ->
    [N, oh, ow, 2] normalized grids (PIL PERSPECTIVE convention)."""
    cf = jnp.asarray(coeffs, jnp.float32)
    a, b, cc, d, e, f, g, h = [cf[:, i][:, None, None] for i in range(8)]
    oh, ow = out_hw
    xs = jnp.arange(ow, dtype=jnp.float32)[None, None, :] + 0.5
    ys = jnp.arange(oh, dtype=jnp.float32)[None, :, None] + 0.5
    denom = g * xs + h * ys + 1.0
    sx = (a * xs + b * ys + cc) / denom
    sy = (d * xs + e * ys + f) / denom
    sh, sw = src_hw
    gx = 2.0 * sx / sw - 1.0
    gy = 2.0 * sy / sh - 1.0
    return jnp.stack([gx, gy], axis=-1)


def warp_by_grid(images: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Batched bilinear resample: images [B,H,W,C], grid [B,Ho,Wo,2] or
    [Ho,Wo,2] (broadcast). Out-of-bounds samples are zero (PIL fills 0)."""
    if grid.ndim == 3:
        grid = jnp.broadcast_to(grid[None], (images.shape[0],) + grid.shape)
    return grid_sample_bilinear(images, grid)


def paste_back(projected: jnp.ndarray, mask: jnp.ndarray,
               orig: jnp.ndarray) -> jnp.ndarray:
    """paste_image (alignment_stit.py:14-18): alpha-composite the projected
    crop over the original using its in-bounds mask."""
    return projected * mask + orig * (1.0 - mask)
