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

import os

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
    if g and g <= 4:
        # Small group counts: unroll statically. A ``lax.map`` here costs a
        # device while-loop + dynamic-update-slice per group and serializes
        # the (independent) gathers behind the loop barrier — measured
        # ~30% of DNet's whole stage time at g=2 (r5_xplane_dnet). The
        # unrolled groups fuse/pipeline freely; math is identical. Capped
        # at 4 so the worst-case live padded temps stay <=4 GB if XLA
        # chooses to materialize every group at once.
        parts = []
        for k in range(g):
            m = n // g
            sl = tuple(a[:, k * m:(k + 1) * m] for a in flats)
            parts.append(interp(sl))
        out = jnp.concatenate(parts, axis=1)  # [B, n, C]
    elif g:
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


# Shear-resample row-group size and residual-shift tap count. G bounds the
# gather descriptor count (R/G per frame); U bounds the within-group source
# drift the residual pass can absorb: |shift|*(G-1) <= U-2. G=16/U=24
# measured fastest on v5e (tools/out/r5_shear_g_probe.out: gpen512_step5
# 4.18/3.59/4.31 ms/frame and mouth_tail 14.39/13.72/14.45 at G=8/16/32 —
# G=32's 47-tap residual loop eats the gather win); the shift bound stays
# (U-2)/(G-1) ~ 1.47. S2V_SHEAR_G/S2V_SHEAR_U remain a bench-probe
# override, not a product knob.
_SHEAR_G = int(os.environ.get("S2V_SHEAR_G", "16"))
_SHEAR_U = int(os.environ.get("S2V_SHEAR_U", "24"))


def _shear_resample_rows(x: jnp.ndarray, stride: jnp.ndarray,
                         shift: jnp.ndarray, const: jnp.ndarray,
                         out_s: int) -> jnp.ndarray:
    """Per-row sheared 1D resample along the minor spatial axis.

    x: CHANNELS-FIRST [N, C, R, S]; out[n, c, r, t] = x[n, c, r,
    stride[n]*t + shift[n]*r + const[n]] with linear interpolation,
    ~zeros outside [0, S).

    TPU-first (round-5 trace-driven redesign, tools/out/r5_xplane_*.json):

    * the per-row source positions decompose into an integer window
      offset per GROUP of ``_SHEAR_G`` rows — one strided ``lax.gather``
      slice per (channel, group), R/G descriptors per image plane instead
      of R. The per-ROW variant's 8192 descriptors/batch lowered to a
      serial dynamic-slice while-loop that dominated both enhancement
      stages.
    * the gathered window is laid out with (rows, window) as the tiled
      minor dims — channels-first, so the TPU's (8, 128) tiling pads the
      1000-wide window dimension ~11% instead of padding a C=3 lane
      dimension 42x (the first grouped attempt kept C minor and the
      gather moved 42x the logical bytes: 56 us per 100 KB slice).
    * a per-row residual shift of statically bounded range ``_SHEAR_U``
      (a U-tap one-hot lerp XLA fuses into one lane-shift stencil pass),
    * and a shared-stride resample as a banded-weight matmul on the MXU
      (``_interp_weights``).

    Valid for stride > 0 (no mirroring) and |shift| <= (U-2)/(G-1)
    (~1.4, i.e. rotations to ~55 deg — the pipeline's umeyama similarity
    warps stay well inside); callers mask out-of-bounds outputs.
    """
    n, c, r, s = x.shape
    G, U = _SHEAR_G, _SHEAR_U
    rp = -(-r // G) * G             # rows padded to a multiple of G
    if rp != r:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, rp - r), (0, 0)))
    gc = rp // G
    # Lerped window offsets x in [0, 2s] cover every in-bounds source a row
    # can request (positions base + stride*t with base >= -s, source < s);
    # the gathered window adds U for the per-row residual shift and one
    # extra tap for its lerp.
    kx = 2 * s + 1                  # einsum window width (as before)
    kg = kx + U                     # gathered window width per group
    if os.environ.get("S2V_SHEAR_KG128") == "1":
        # Probe: round the gathered slice width up to a lane-tile multiple
        # in case the serial dynamic-slice lowering of the group gather
        # (r5_xplane_mouth_tail3 while.31-34) is minor-dim-alignment-bound.
        kg = -(-kg // 128) * 128
    # group starts range over [0, 2s]; the padded row must fit start+kg
    pad_l, pad_r = s, kg
    rows = jnp.arange(rp, dtype=jnp.float32)
    pos = shift[:, None] * rows[None, :] + const[:, None]       # [N, Rp]
    # Group window origin: the smallest row base in the group (pos is
    # monotonic in r, so it's one of the group's end rows), clipped so the
    # gather always reads legal padded memory. Rows whose pos falls outside
    # [-s, s] sample out-of-source anyway — the caller's footprint mask
    # zeroes them, exactly like the old per-row clip did.
    pg = pos.reshape(n, gc, G)
    base_g = jnp.clip(jnp.floor(jnp.min(pg, axis=2)), -float(s), float(s))
    starts = base_g.astype(jnp.int32) + pad_l                   # [N, Gc]
    resid = jnp.clip(pg - base_g[..., None], 0.0, U - 2 + 0.999)
    ri = jnp.floor(resid)
    rf = (resid - ri).reshape(n, rp)                            # [N, Rp]
    ri = ri.reshape(n, rp)

    # Edge-replicate padding: a window origin slightly out of bounds must
    # not bleed zeros into in-bounds samples (the final sample position
    # base+resid+stride*t can be in-bounds even when base < 0).
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (pad_l, pad_r)), mode="edge")
    # One slice per (channel, row-group): index vector (c, g*G, start),
    # slice [1, G, Kg] with (G, Kg) as the result's tiled minor dims.
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2),
        collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2),
    )
    cs = jnp.broadcast_to(
        jnp.arange(c, dtype=jnp.int32)[:, None], (c, gc))       # [C, Gc]
    gs = jnp.broadcast_to(
        jnp.arange(gc, dtype=jnp.int32)[None] * G, (c, gc))
    st = jnp.stack(
        [jnp.broadcast_to(cs[None], (n, c, gc)),
         jnp.broadcast_to(gs[None], (n, c, gc)),
         jnp.broadcast_to(starts[:, None], (n, c, gc))],
        axis=-1).reshape(n, c * gc, 3)                          # [N, CGc, 3]

    def gather_groups(img, idx):
        return lax.gather(img, idx, dnums, slice_sizes=(1, G, kg),
                          mode=lax.GatherScatterMode.CLIP)

    win = jax.vmap(gather_groups)(xp, st)       # [N, C*Gc, G, Kg]
    win = win.reshape(n, c, rp, kg)
    # Per-row residual shift: a U-tap one-hot lerp (weight (1-rf) at tap
    # ri, rf at tap ri+1) over U statically lane-shifted views — XLA
    # fuses the sum into one stencil pass. window[x] then holds source
    # pos+x.
    us = jnp.arange(U, dtype=ri.dtype).reshape(1, 1, U)
    wu = ((us == ri[..., None]) * (1.0 - rf)[..., None]
          + (us == (ri + 1.0)[..., None]) * rf[..., None])      # [N, Rp, U]
    wu = wu[:, None]                                            # [N,1,Rp,U]
    acc = wu[..., 0, None] * win[..., 0:kx]
    for u in range(1, U):
        acc = acc + wu[..., u, None] * win[..., u:u + kx]
    # shared-stride resample on the MXU: positions stride*t within the
    # window (the per-row offset is already absorbed above)
    ts = jnp.arange(out_s, dtype=jnp.float32)
    wx = _interp_weights(stride[:, None] * ts[None, :], kx)     # [N,T,Kx]
    out = jnp.einsum("ntx,ncrx->ncrt", wx, acc,
                     precision=lax.Precision.HIGHEST)
    return out[:, :, :r]


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
    Validity domain: d > 0, (a - b*c/d) > 0, and per-pass shear
    |b/d| resp. |c| <= (_SHEAR_U - 2) / (_SHEAR_G - 1) (~1.43, i.e.
    positive scale with |rotation| up to ~55 deg; beyond that the grouped
    residual window clips and samples drift) — comfortably met by the
    pipeline's umeyama similarity aligns/pastes, whose head-roll angles
    stay far inside it. Out-of-bounds outputs are zeroed like cv2's
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
    # channels-first through both passes (see _shear_resample_rows: the
    # gathered window must keep (rows, window) as the tiled minor dims)
    x = jnp.transpose(images.astype(jnp.float32), (0, 3, 1, 2))
    # pass 1: rows keep their y, columns resampled to output-x space
    mid = _shear_resample_rows(x, ax, bx, cx, ow)        # [N, C, H, ow]
    # pass 2: per output column j, resample along y at i10*j + i11*i + i12
    mid_t = jnp.swapaxes(mid, 2, 3)                      # [N, C, ow, H]
    out_t = _shear_resample_rows(mid_t, i11, i10, i12, oh)
    out = jnp.transpose(out_t, (0, 3, 2, 1))             # [N, oh, ow, C]

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
