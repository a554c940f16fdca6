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

import jax
import jax.numpy as jnp
from jax import lax


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

    TPU-first: all four bilinear taps come from ONE ``lax.gather`` of 2x2xC
    patches instead of four flat per-pixel gathers — the patch rows are
    contiguous in memory, so the TPU issues 4x fewer gather descriptors for
    the same bytes (measured 1.2-1.4x faster at 512^2 on v5e; gathers stay
    the cost floor, so axis-aligned callers should use the separable-matmul
    paths below, which are 20-30x faster). Extra channels are nearly free —
    callers warping several tensors by the same grid should concatenate
    them into one call. Out-of-bounds taps are zero-masked (torch zeros
    padding); the patch start is clamped so the gather itself always reads
    in-bounds memory.
    """
    b, h, w, c = image.shape
    gx, gy = grid[..., 0], grid[..., 1]
    # Unnormalize (align_corners=False): ix = ((x + 1) * W - 1) / 2
    ix = ((gx + 1.0) * w - 1.0) * 0.5
    iy = ((gy + 1.0) * h - 1.0) * 0.5

    if h < 2 or w < 2:
        # Degenerate sources can't host a 2x2 patch; zero-pad them (the
        # padded texels sit out-of-bounds, so the masks below ignore them).
        image = jnp.pad(
            image, ((0, 0), (0, 2 - h if h < 2 else 0),
                    (0, 2 - w if w < 2 else 0), (0, 0)))

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    fx = ix - ix0
    fy = iy - iy0

    out_shape = ix.shape[1:]  # [Hg, Wg] (or any trailing grid shape)
    n = 1
    for s in out_shape:
        n *= s

    # Clamp the patch origin so [ys:ys+2, xs:xs+2] is always a legal read.
    # NaN coords index patch 0 (masked to zero below, like the torch op).
    iy0i = jnp.nan_to_num(iy0, nan=-2.0, posinf=float(h), neginf=-2.0)
    ix0i = jnp.nan_to_num(ix0, nan=-2.0, posinf=float(w), neginf=-2.0)
    ys = jnp.clip(iy0i.astype(jnp.int32), 0, max(h - 2, 0)).reshape(b, n)
    xs = jnp.clip(ix0i.astype(jnp.int32), 0, max(w - 2, 0)).reshape(b, n)

    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    def interp(args):
        """Gather + 4-tap lerp for one pixel group: each arg is [B, m]."""
        ys_, xs_, ry_, rx_, fx_, fy_ = args
        st = jnp.stack([ys_, xs_], axis=-1)  # [B, m, 2]

        def gather_one(img, s):
            return lax.gather(
                img, s, dnums, slice_sizes=(2, 2, c),
                mode=lax.GatherScatterMode.CLIP,
            )

        patches = jax.vmap(gather_one)(image, st)  # [B, m, 2, 2, C]
        p00, p01 = patches[:, :, 0, 0], patches[:, :, 0, 1]
        p10, p11 = patches[:, :, 1, 0], patches[:, :, 1, 1]

        def tap(dy, dx):
            row = ry_ + dy
            col = rx_ + dx
            r = row - ys_.astype(row.dtype)  # {0,1} for in-bounds taps
            s_ = col - xs_.astype(col.dtype)
            top = jnp.where((s_ == 0)[..., None], p00, p01)
            bot = jnp.where((s_ == 0)[..., None], p10, p11)
            v = jnp.where((r == 0)[..., None], top, bot)
            inb = ((row >= 0) & (row <= h - 1)
                   & (col >= 0) & (col <= w - 1))
            return v * inb[..., None].astype(image.dtype)

        v00 = tap(0.0, 0.0)
        v01 = tap(0.0, 1.0)
        v10 = tap(1.0, 0.0)
        v11 = tap(1.0, 1.0)
        fxm = fx_[..., None].astype(image.dtype)
        fym = fy_[..., None].astype(image.dtype)
        top = v00 * (1.0 - fxm) + v01 * fxm
        bot = v10 * (1.0 - fxm) + v11 * fxm
        return top * (1.0 - fym) + bot * fym  # [B, m, C]

    flats = (ys, xs, iy0i.reshape(b, n), ix0i.reshape(b, n),
             fx.reshape(b, n), fy.reshape(b, n))

    # The gather's patch dims land in the TPU output layout's TILED minor
    # positions, so XLA pads the (2,2,C) minors of [B,n,2,2,C] 40-130x.
    # Whether that padded temp is ever materialized is fusion-dependent —
    # when it is, a 512^2 x batch-32 warp allocates 16 GB for 384 MB of
    # patches and OOMs HBM (measured v5e; layout tricks don't help, the
    # TPU gather lowering re-canonicalizes offset dims). Bound it by
    # construction instead: big warps run the gather+lerp over pixel
    # groups under ``lax.map`` — identical math, peak temp divided by the
    # group count, ~zero overhead since the warp is gather-rate-bound.
    limit = 1 << 19  # patches per group: <=1 GB padded temp worst-case
    total = b * n
    g = 0
    if total > limit:
        g_need = -(-total // limit)
        g = next((k for k in range(g_need, min(4 * g_need, n) + 1)
                  if n % k == 0), 0)
    if g:
        m = n // g
        grouped = tuple(
            a.reshape(b, g, m).swapaxes(0, 1) for a in flats)  # [g, B, m]
        out = lax.map(interp, grouped)  # [g, B, m, C]
        out = out.swapaxes(0, 1).reshape(b, n, c)
    else:
        out = interp(flats)
    return out.reshape(b, *out_shape, c)


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


def _interp_weights(src: jnp.ndarray, size: int) -> jnp.ndarray:
    """[..., out] float sample positions -> [..., out, size] bilinear weights.

    Built from a broadcasted iota equality compare — no gather, no host
    work. Out-of-range taps simply never match an index and get weight zero,
    which reproduces ``grid_sample``'s zeros padding exactly (a tap pair
    straddling the border keeps only its in-bounds member's weight).
    """
    i0 = jnp.floor(src)
    f = src - i0
    cols = jnp.arange(size, dtype=src.dtype)
    shape = (1,) * src.ndim + (size,)
    cols = cols.reshape(shape)
    w0 = (cols == i0[..., None]).astype(src.dtype) * (1.0 - f)[..., None]
    w1 = (cols == (i0 + 1.0)[..., None]).astype(src.dtype) * f[..., None]
    return w0 + w1


def _resample_separable(images: jnp.ndarray, sy: jnp.ndarray,
                        sx: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned bilinear resample as two batched matmuls (MXU path).

    images: [N, H, W, C]; sy: [N, oh] / sx: [N, ow] per-frame source pixel
    positions. Equivalent to ``grid_sample_bilinear`` on the outer-product
    grid of (sx, sy) — measured ~20x faster than the gather formulation at
    384^2-512^2 on v5e (the weights are dense [N,oh,H]/[N,ow,W] matrices but
    the contraction runs on the systolic array instead of issuing per-pixel
    gather descriptors).
    """
    n, h, w, _ = images.shape
    dt = images.dtype if images.dtype in (jnp.float32, jnp.bfloat16) \
        else jnp.float32
    wy = _interp_weights(sy.astype(dt), h)  # [N, oh, H]
    wx = _interp_weights(sx.astype(dt), w)  # [N, ow, W]
    prec = lax.Precision.HIGHEST if dt == jnp.float32 else None
    x = images.astype(dt)
    x = jnp.einsum("nyh,nhwc->nywc", wy, x, precision=prec)
    x = jnp.einsum("nxw,nywc->nyxc", wx, x, precision=prec)
    return x.astype(images.dtype if images.dtype != jnp.uint8 else dt)


def crop_resize_boxes(images: jnp.ndarray, boxes, out_hw) -> jnp.ndarray:
    """Batched per-frame box crop + bilinear resize, separable-matmul form.

    images: [N, H, W, C]; boxes: [N, 4] (x1, y1, x2, y2) ints/floats;
    out_hw: static (oh, ow). Equivalent to resizing each crop with torch
    bilinear align_corners=False (edge behavior samples true neighboring
    image pixels instead of clamping at the crop border — sub-pixel
    difference on the outermost ring only).
    """
    n, h, w, _ = images.shape
    oh, ow = out_hw
    boxes = jnp.asarray(boxes, jnp.float32)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    tx = (jnp.arange(ow, dtype=jnp.float32) + 0.5) / ow
    ty = (jnp.arange(oh, dtype=jnp.float32) + 0.5) / oh
    sx = x1[:, None] + tx[None, :] * (x2 - x1)[:, None] - 0.5  # [N, ow]
    sy = y1[:, None] + ty[None, :] * (y2 - y1)[:, None] - 0.5  # [N, oh]
    return _resample_separable(images, sy, sx)


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


def _shear_resample_rows(x: jnp.ndarray, stride: jnp.ndarray,
                         shift: jnp.ndarray, const: jnp.ndarray,
                         out_s: int) -> jnp.ndarray:
    """Per-row sheared 1D resample along the minor spatial axis.

    x: [N, R, S, C]; out[n, r, t] = x[n, r, stride[n]*t + shift[n]*r +
    const[n]] with linear interpolation, ~zeros outside [0, S).

    TPU-first: the per-row source positions decompose into an integer
    per-row window offset (ONE row-granular ``lax.gather`` — R descriptors
    per frame instead of R*S pixel descriptors), a fractional per-row shift
    (a 2-tap elementwise lerp), and a shared-stride resample that runs as a
    banded-weight matmul on the MXU (``_interp_weights``). Valid for
    stride > 0 (no mirroring); callers mask out-of-bounds outputs.
    """
    n, r, s, c = x.shape
    # Window [base, base + k-1] must cover every in-bounds source this row
    # can request: positions are base + frac + stride*t with stride*t >= 0,
    # and for base >= -s the farthest in-bounds source needs
    # stride*t < s - base <= 2s — hence k-1 = 2s+1 (one extra for the lerp).
    k = 2 * s + 2                   # gathered window width
    pad_l, pad_r = s, 2 * s + 2     # window start range [0, 2s] fits
    rows = jnp.arange(r, dtype=jnp.float32)
    pos = shift[:, None] * rows[None, :] + const[:, None]       # [N, R]
    base = jnp.clip(jnp.floor(pos), -float(s), float(s))
    frac = jnp.clip(pos - base, 0.0, 1.0)[..., None, None]      # [N, R,1,1]
    starts = (base.astype(jnp.int32) + pad_l)                   # [N, R]

    # Edge-replicate padding: a window origin slightly out of bounds must
    # not bleed zeros into in-bounds samples (the final sample position
    # base+frac+stride*t can be in-bounds even when base < 0). Fully
    # out-of-bounds outputs are zeroed by the caller's footprint mask.
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad_l, pad_r), (0, 0)), mode="edge")
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2),
        collapsed_slice_dims=(0,),
        start_index_map=(0, 1),
    )
    st = jnp.stack(
        [jnp.broadcast_to(jnp.arange(r, dtype=jnp.int32)[None], (n, r)),
         starts], axis=-1)                                      # [N, R, 2]

    def gather_rows(img, idx):
        return lax.gather(img, idx, dnums, slice_sizes=(1, k, c),
                          mode=lax.GatherScatterMode.CLIP)

    win = jax.vmap(gather_rows)(xp, st)                         # [N, R, K, C]
    # fractional per-row shift: window[x] now holds source base+frac+x
    win = win[:, :, : k - 1] * (1.0 - frac) + win[:, :, 1:] * frac
    # shared-stride resample on the MXU: positions stride*t within the
    # window (the per-row offset is already absorbed above)
    ts = jnp.arange(out_s, dtype=jnp.float32)
    wx = _interp_weights(stride[:, None] * ts[None, :], k - 1)  # [N,T,K-1]
    return jnp.einsum("ntx,nrxc->nrtc", wx, win,
                      precision=lax.Precision.HIGHEST)


def affine_warp_shear(images: jnp.ndarray, mats: jnp.ndarray, out_hw,
                      inverse: bool = False) -> jnp.ndarray:
    """Approximate ``affine_warp`` as two sheared separable passes — zero
    per-pixel gathers.

    The dst->src affine [[a, b, tx], [c, d, ty]] factors (Catmull-Smith
    two-pass) into a horizontal pass x' = (a - b*c/d)*j + (b/d)*y + const
    over source rows followed by a vertical pass y' = c*j + d*i + ty over
    columns; each pass runs via ``_shear_resample_rows`` (row-granular
    gather + lerp + MXU matmul). ~10x faster than the 2x2-patch gather at
    512^2 outputs, where the exact path is descriptor-rate-bound (measured
    round 3: ~6.8 ms/frame; see NOTES_ROUND3).

    APPROX (opt-in; config ``model.approx_warp``): each pass interpolates
    with a lerp-of-lerp (the per-row fractional shift is one lerp, the
    shared-stride MXU resample another), so the effective kernel is a
    3-tap composite per axis rather than bilinear's 2-tap tent. Its
    weights sum to 1 with first moment at the true sample position —
    EXACT on locally-linear image content, slight smoothing on curvature
    (~50 dB PSNR vs the exact path on smooth natural content, measured in
    tests/test_warp_shear.py).
    Validity domain: d > 0 and (a - b*c/d) > 0, i.e. positive scale and
    |rotation| < 90 deg — always true for the pipeline's umeyama similarity
    aligns/pastes. Out-of-bounds outputs are zeroed like cv2's
    BORDER_CONSTANT; the border ring may differ from the exact path by one
    tap. The exact ``affine_warp`` remains the default and the parity
    surface.
    """
    n, h, w, _ = images.shape
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

    d_safe = jnp.where(jnp.abs(i11) < 1e-6, 1e-6, i11)
    ax = i00 - i01 * i10 / d_safe          # horizontal shared stride
    bx = i01 / d_safe                      # horizontal per-row shift
    cx = i02 - i01 * i12 / d_safe
    x = images.astype(jnp.float32)
    # pass 1: rows keep their y, columns resampled to output-x space
    mid = _shear_resample_rows(x, ax, bx, cx, ow)        # [N, H, ow, C]
    # pass 2: per output column j, resample along y at i10*j + i11*i + i12
    mid_t = jnp.swapaxes(mid, 1, 2)                      # [N, ow, H, C]
    out_t = _shear_resample_rows(mid_t, i11, i10, i12, oh)
    out = jnp.swapaxes(out_t, 1, 2)                      # [N, oh, ow, C]

    # zero outside the source footprint (cv2 BORDER_CONSTANT)
    xs = jnp.arange(ow, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(oh, dtype=jnp.float32)[None, :, None]
    cc = lambda v: v[:, None, None]
    sx = cc(i00) * xs + cc(i01) * ys + cc(i02)
    sy = cc(i10) * xs + cc(i11) * ys + cc(i12)
    inb = (sx > -1.0) & (sx < w) & (sy > -1.0) & (sy < h)
    return jnp.where(inb[..., None], out, 0.0).astype(
        images.dtype if images.dtype != jnp.uint8 else jnp.float32)


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
    warped = _resample_separable(preds, v, u)  # [N, H, W, C]

    in_x = (xs - 0.5 >= x1) & (xs - 0.5 < x2)          # [N, W]
    in_y = (ys - 0.5 >= y1) & (ys - 0.5 < y2)          # [N, H]
    mask = (in_y[:, :, None] & in_x[:, None, :])[..., None]
    return jnp.where(mask, warped, frames)
