"""GPEN FaceEnhancement orchestration (reference:
third_part/GPEN/face_enhancement.py:48-193 + align_faces.py).

Flow per frame: RetinaFace detect (best face + 5 landmarks) -> umeyama
similarity warp to the reference facial points -> FullGenerator (GAN
enhance) -> ParseNet face mask -> border-zero + double-gaussian mask
postprocess -> inverse affine paste -> composite. Three composite modes,
matching face_enhancement.py:91-193:

- ``use_sr``: RealESRNet (RRDBNet x``sr_scale``) super-resolves the full
  frame first; detection/warp run on the bilinear-2x frame and the enhanced
  face is composited over the SR frame (face_enhancement.py:103-106,177-178)
  — the GPEN-BFR-2048 final-enhancement configuration (inference.py:228-231).
- ``possion_blending``: 6-level Laplacian-pyramid blend at 512^2, optional
  bbox-restricted mask (face_enhancement.py:179-189).
- default: double alpha composite over the original (face_enhancement.py:191-193).

TPU-first: detection, SR, GAN, parsing, every affine warp and the composites
are *batched* jitted programs over frame chunks; the host only solves the
per-frame 2x3 umeyama similarity (tiny) — no per-frame device round-trips
(the reference loops frames on host, inference.py:234-238,317-330).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from s2v_tpu.ops.image import resize_bilinear
from s2v_tpu.ops.warp import (affine_warp, affine_warp_shear,
                              grid_sample_bilinear)
from s2v_tpu.pipeline.utils import gaussian_blur, laplacian_pyramid_blend, mask_postprocess

# align_faces.py:14-22
REFERENCE_FACIAL_POINTS = np.array(
    [[30.29459953, 51.69630051], [65.53179932, 51.50139999],
     [48.02519989, 71.73660278], [33.54930115, 92.3655014],
     [62.72990036, 92.20410156]], np.float32,
)
DEFAULT_CROP_SIZE = (96, 112)

# the small-face smoothing kernel (face_enhancement.py:72-75)
SMALL_FACE_KERNEL = np.array(
    [[0.0625, 0.125, 0.0625],
     [0.125, 0.25, 0.125],
     [0.0625, 0.125, 0.0625]], np.float32,
)


def get_reference_facial_points(output_size: Tuple[int, int],
                                inner_padding_factor: float = 0.25,
                                outer_padding: Tuple[int, int] = (0, 0),
                                default_square: bool = True) -> np.ndarray:
    """align_faces.py:101-207 (the FaceEnhancement configuration)."""
    tmp_5pts = REFERENCE_FACIAL_POINTS.copy().astype(np.float64)
    tmp_crop_size = np.array(DEFAULT_CROP_SIZE, np.float64)

    if default_square:
        size_diff = max(tmp_crop_size) - tmp_crop_size
        tmp_5pts += size_diff / 2
        tmp_crop_size += size_diff

    if (output_size and output_size[0] == tmp_crop_size[0]
            and output_size[1] == tmp_crop_size[1]):
        return tmp_5pts.astype(np.float32)
    if inner_padding_factor == 0 and outer_padding == (0, 0):
        return tmp_5pts.astype(np.float32)

    if inner_padding_factor > 0:
        size_diff = tmp_crop_size * inner_padding_factor * 2
        tmp_5pts += size_diff / 2
        tmp_crop_size += np.round(size_diff)

    size_bf_outer_pad = np.array(output_size) - np.array(outer_padding) * 2
    scale_factor = size_bf_outer_pad[0] / tmp_crop_size[0]
    tmp_5pts = tmp_5pts * scale_factor
    tmp_5pts += np.array(outer_padding)
    return tmp_5pts.astype(np.float32)


def umeyama_with_scale(src: np.ndarray, dst: np.ndarray,
                       estimate_scale: bool = True,
                       scale: Optional[float] = None):
    """align_faces.py _umeyama: returns (3x3 params, scale). When
    estimate_scale is False a provided scale is applied (the reference uses
    this for the inverse transform, align_faces.py:258-262)."""
    num, dim = src.shape
    src_mean = src.mean(axis=0)
    dst_mean = dst.mean(axis=0)
    src_d = src - src_mean
    dst_d = dst - dst_mean
    a = dst_d.T @ src_d / num
    d = np.ones((dim,))
    if np.linalg.det(a) < 0:
        d[dim - 1] = -1
    t = np.eye(dim + 1)
    u, s, v = np.linalg.svd(a)
    rank = np.linalg.matrix_rank(a)
    if rank == dim - 1:
        if np.linalg.det(u) * np.linalg.det(v) > 0:
            t[:dim, :dim] = u @ v
        else:
            s_ = d[dim - 1]
            d[dim - 1] = -1
            t[:dim, :dim] = u @ np.diag(d) @ v
            d[dim - 1] = s_
    else:
        t[:dim, :dim] = u @ np.diag(d) @ v
    if estimate_scale:
        sc = 1.0 / src_d.var(axis=0).sum() * (s @ d)
    else:
        sc = 1.0 if scale is None else scale
    t[:dim, dim] = dst_mean - sc * (t[:dim, :dim] @ src_mean)
    t[:dim, :dim] *= sc
    return t, sc


def umeyama_similarity_batched(src: jnp.ndarray, dst: jnp.ndarray,
                               estimate_scale: bool = True,
                               scale: Optional[jnp.ndarray] = None):
    """Batched device-side umeyama similarity solve: src [B,P,2] ->
    dst [B,P,2] (or [P,2], broadcast). Returns (tfm [B,2,3], scale [B]).

    TPU-first: for the 2D similarity case the SVD in skimage's _umeyama
    collapses to a closed form — the optimal rotation is the special
    orthogonal polar factor of A = dst_d^T src_d / P, i.e.
    theta = atan2(A10 - A01, A00 + A11), and S.d = hypot of the same two
    terms — so the whole solve is a handful of fused elementwise ops and
    the detect -> align -> enhance chain compiles into ONE program with no
    host round-trip (the reference solves per-frame on CPU,
    align_faces.py:210-267). Matches umeyama_with_scale for every
    non-degenerate input, including the det<0 reflection branch.
    """
    if dst.ndim == 2:
        dst = jnp.broadcast_to(dst[None], src.shape)
    p = src.shape[1]
    sm = src.mean(axis=1)
    dm = dst.mean(axis=1)
    sd = src - sm[:, None]
    dd = dst - dm[:, None]
    a = jnp.einsum("bpi,bpj->bij", dd, sd) / p
    num = a[:, 1, 0] - a[:, 0, 1]
    den = a[:, 0, 0] + a[:, 1, 1]
    theta = jnp.arctan2(num, den)
    cs, sn = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.stack(
        [jnp.stack([cs, -sn], -1), jnp.stack([sn, cs], -1)], axis=1
    )  # [B, 2, 2]
    if estimate_scale:
        src_var = jnp.mean(jnp.sum(sd * sd, axis=-1), axis=1)
        sc = jnp.hypot(den, num) / jnp.maximum(src_var, 1e-12)
    else:
        sc = (jnp.ones_like(den) if scale is None
              else jnp.broadcast_to(scale, den.shape))
    rs = rot * sc[:, None, None]
    t = dm - jnp.einsum("bij,bj->bi", rs, sm)
    return jnp.concatenate([rs, t[:, :, None]], axis=-1), sc


def warp_and_crop_transforms(facial5: np.ndarray, reference_pts: np.ndarray):
    """align_faces.py:210-267 'smilarity' path: (tfm [2,3], tfm_inv [2,3])."""
    params, scale = umeyama_with_scale(facial5, reference_pts, True)
    tfm = params[:2]
    params_inv, _ = umeyama_with_scale(reference_pts, facial5, False,
                                       scale=1.0 / scale)
    return tfm, params_inv[:2]


def affine_sample_grid(tfm: np.ndarray, out_hw: Tuple[int, int],
                       src_hw: Tuple[int, int]) -> np.ndarray:
    """Sampling grid equivalent to cv2.warpAffine(src, tfm, out) with
    bilinear sampling: dst(x, y) samples src at tfm^-1 (x, y) in integer
    index space. (Host-grid variant; the batched device path is
    s2v_tpu.ops.warp.affine_warp.)"""
    m = np.vstack([tfm, [0, 0, 1]]).astype(np.float64)
    minv = np.linalg.inv(m)
    oh, ow = out_hw
    xs = np.arange(ow, dtype=np.float64)[None, :]
    ys = np.arange(oh, dtype=np.float64)[:, None]
    sx = minv[0, 0] * xs + minv[0, 1] * ys + minv[0, 2]
    sy = minv[1, 0] * xs + minv[1, 1] * ys + minv[1, 2]
    sh, sw = src_hw
    gx = (2.0 * sx + 1.0) / sw - 1.0
    gy = (2.0 * sy + 1.0) / sh - 1.0
    return np.stack(np.broadcast_arrays(gx, gy), axis=-1).astype(np.float32)


@functools.lru_cache(maxsize=None)
def paste_mask_512() -> np.ndarray:
    """The fixed 512^2 paste mask (face_enhancement.py:66-70): an inset
    rectangle blurred twice with GaussianBlur(101, 11)."""
    mask = np.zeros((512, 512), np.float32)
    mask[26:487, 26:487] = 1.0  # cv2.rectangle (26,26)-(486,486) filled
    m = jnp.asarray(mask)[None, :, :, None]
    m = gaussian_blur(m, 101, 11.0)
    m = gaussian_blur(m, 101, 11.0)
    return np.asarray(m)[0, :, :, 0]


def _small_face_filter(x: jnp.ndarray) -> jnp.ndarray:
    """cv2.filter2D with the 3x3 smoothing kernel, REFLECT_101 border
    (face_enhancement.py:153-154, applied when min face side < 100)."""
    c = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    w = jnp.tile(jnp.asarray(SMALL_FACE_KERNEL)[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        xp, w, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


class FaceEnhancer:
    """FaceEnhancement equivalent with converted flax weights.

    models: dict with keys 'retinaface', 'facegan' (FullGenerator[SR]
    variables), 'parsenet', and — when ``use_sr`` — 'srmodel' (RRDBNet).
    """

    # face region colormap (face_enhancement.py:141)
    MM = [0, 255, 255, 255, 255, 255, 255, 255, 0, 0, 255, 255, 255, 0, 0, 0, 0, 0, 0]

    def __init__(self, models: dict, in_size: int = 512,
                 use_sr: bool = False, sr_scale: int = 2,
                 sr_num_feat: int = 32, threshold: float = 0.9,
                 chunk: Optional[int] = None, dtype: str = "bfloat16",
                 approx_warp: bool = False, det_dtype: str = "float32",
                 parse_size: int = 512, mesh=None):
        from s2v_tpu.models.gpen import fullgenerator_arch
        from s2v_tpu.models.parsenet import parse_mask, parsenet_arch
        from s2v_tpu.models.retinaface import (
            RETINA_MEAN, detect_faces, retinaface_arch,
        )
        from s2v_tpu.models.rrdbnet import RRDBNet, rrdbnet_arch

        self.models = models
        self.in_size = in_size
        self.use_sr = bool(use_sr and models.get("srmodel") is not None)
        self.sr_scale = sr_scale
        self.threshold = threshold
        # 2048^2 GPEN crops are ~50 MB each; keep per-program batches small
        self.chunk = chunk if chunk is not None else (1 if in_size >= 1024 else 16)
        self.reference_5pts = get_reference_facial_points(
            (in_size, in_size), 0.25, (0, 0), True
        )
        # multi-chip: a jax.sharding.Mesh shards each chunk's frame axis
        # over the mesh's data axis (per-frame-independent programs, so
        # batch sharding is exact — same contract as LipSyncPipeline).
        # Chunk size must divide by the data-axis size. Model variables
        # pass as uncommitted jit args and replicate automatically.
        if mesh is not None:
            from s2v_tpu.parallel.mesh import shard_frames_if_divisible
            self._place = lambda c: shard_frames_if_divisible(c, mesh)
        else:
            self._place = lambda c: c

        # model geometry is inferred from the variable trees (converted
        # reference checkpoints resolve to the production configs; slim
        # test trees and cfg_mnet RetinaFace checkpoints resolve to theirs)
        retina = retinaface_arch(models["retinaface"])
        facegan = fullgenerator_arch(models["facegan"], size=in_size)
        parser = parsenet_arch(models["parsenet"])
        s = in_size
        # opt-in approx mode (config model.approx_warp): similarity warps
        # run as two sheared separable passes (zero per-pixel gathers, MXU
        # resample) at a documented quality delta — see ops/warp.py
        # affine_warp_shear. The exact path stays the parity surface.
        warp = affine_warp_shear if approx_warp else affine_warp
        # GAN/SR compute dtype: bf16 keeps the MXU at full rate; detection
        # and the mask/composite math stay f32
        dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        # RetinaFace conv dtype (config model.detector_dtype, same contract
        # as the S3FD/FAN sweeps): f32 default matches the reference; bf16
        # runs the detector's MXU convs at full rate with sub-pixel box/
        # landmark jitter. The anchor decode always runs f32.
        det_dt = jnp.bfloat16 if det_dtype == "bfloat16" else jnp.float32

        def retina_fwd(variables, bgr):
            outs = retina.apply(variables, bgr.astype(det_dt))
            return tuple(o.astype(jnp.float32) for o in outs)

        # ParseNet working resolution (config model.parse_size). 512 is the
        # reference geometry (face_parsing.py); 256 quarters the parser's
        # bandwidth floor — the argmax mask is bilinearly upsampled back to
        # 512 before the sigma-11 postprocess blurs, so the quality delta
        # is confined to ~1px of mask-boundary rounding pre-blur.
        ps = int(parse_size)

        @jax.jit
        def detect(variables, frames_rgb):
            x = frames_rgb.astype(jnp.float32)
            bgr = x[..., ::-1] - jnp.asarray(RETINA_MEAN)
            return detect_faces(retina_fwd(variables, bgr),
                                frames_rgb.shape[1:3], threshold)

        # RealESRNet geometry from the converted checkpoint (num_feat 32 in
        # the reference's final-enhancement config, real_esrnet.py:9-22);
        # sr_num_feat remains the fallback for trees the inference can't read
        srmodel = rrdbnet_arch(models["srmodel"], scale=sr_scale) \
            if models.get("srmodel") is not None else None
        if srmodel is not None and "conv_first" not in (
                models["srmodel"].get("params") or {}):
            srmodel = RRDBNet(scale=sr_scale, num_feat=sr_num_feat)

        @jax.jit
        def sr(variables, frames_rgb):  # [B,H,W,3] 0..255 -> [B,sH,sW,3]
            out = srmodel.apply(
                variables,
                (frames_rgb.astype(jnp.float32) / 255.0).astype(dt))
            return (jnp.clip(out.astype(jnp.float32), 0.0, 1.0)
                    * 255.0).astype(jnp.uint8)

        @functools.partial(jax.jit, static_argnums=(5,))
        def faces_and_masks(variables_gan, variables_parse, frames, tfms,
                            small, do_enhance):
            """Warp to the in_size crop, GAN-enhance, parse the face mask.

            frames [B,H,W,3] 0..255; tfms [B,2,3] frame->crop similarity;
            small [B] bool (face side < 100px); do_enhance: STATIC python
            bool — when False (the Step-5 face_enhance=False configuration,
            inference.py:237) the generator is not in the compiled program
            at all. Returns (ef [B,S,S,3], tmp_mask [B,S,S,1], mask_sharp512
            [B,512,512,1]).
            """
            of = warp(frames.astype(jnp.float32), tfms, (s, s))
            if do_enhance:
                x = (of / 255.0 * 2.0 - 1.0).astype(dt)
                ef = facegan.apply(variables_gan, x, deterministic=True)
                ef = jnp.clip(
                    (ef.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0) * 255.0
            else:
                ef = of
            # the reference parses the UNfiltered ef (the small-face filter2D
            # is applied after mask computation, face_enhancement.py:145-154)
            efp = resize_bilinear(ef, (ps, ps))
            logits, _ = parser.apply(
                variables_parse, (efp / 255.0 * 2.0 - 1.0).astype(dt))
            mask_sharp = parse_mask(logits.astype(jnp.float32), self.MM) / 255.0
            if ps != 512:
                mask_sharp = resize_bilinear(
                    mask_sharp[..., None], (512, 512))[..., 0]
            tmp_mask = mask_postprocess(mask_sharp, thres=26)
            tmp_mask = resize_bilinear(tmp_mask[..., None], (s, s))
            ef = jnp.where(small[:, None, None, None],
                           _small_face_filter(ef), ef)
            return ef, tmp_mask, mask_sharp[..., None]

        @jax.jit
        def paste(ef, tmp_mask, mask_sharp512, tfm_invs, out_shape_like):
            """Inverse-warp face + masks to frame coords
            (face_enhancement.py:144-160). Returns (tmp_img, full_mask,
            mask_sharp_warped) at the frame size."""
            hw = out_shape_like.shape[1:3]
            ms = resize_bilinear(mask_sharp512, (s, s))
            # one 5-channel warp instead of three: gather descriptors (the
            # cost driver) scale with pixels, not channels
            packed = warp(
                jnp.concatenate(
                    [ef.astype(jnp.float32), tmp_mask, ms], axis=-1),
                tfm_invs, hw)
            tmp_img = packed[..., :3]
            full_mask = packed[..., 3:4]
            mask_sharp_w = packed[..., 4:5]
            # cv2.GaussianBlur(ksize=(0,0), sigma=1) on float -> ksize 9
            # (face_enhancement.py:162)
            mask_sharp_w = gaussian_blur(mask_sharp_w, 9, 1.0)
            return tmp_img, full_mask, mask_sharp_w

        @jax.jit
        def composite_sr(img_sr, tmp_img, full_mask, valid):
            img_sr = img_sr.astype(jnp.float32)
            out = img_sr * (1.0 - full_mask) + tmp_img * full_mask
            out = jnp.where(valid[:, None, None, None], out, img_sr)
            return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)

        @jax.jit
        def composite_default(ori, tmp_img, full_mask, mask_sharp_w, valid):
            ori = ori.astype(jnp.float32)
            img = ori * (1.0 - full_mask) + tmp_img * full_mask
            out = ori * (1.0 - mask_sharp_w) + img * mask_sharp_w
            out = jnp.where(valid[:, None, None, None], out, ori)
            return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)

        @jax.jit
        def composite_laplacian(ori, tmp_img, blend_mask, valid):
            """possion_blending path (face_enhancement.py:179-189): 6-level
            Laplacian blend at 512^2, resized back to the frame."""
            ori = ori.astype(jnp.float32)
            hw = ori.shape[1:3]
            fi = resize_bilinear(tmp_img, (512, 512))
            o5 = resize_bilinear(ori, (512, 512))
            m5 = resize_bilinear(blend_mask, (512, 512))
            blended = laplacian_pyramid_blend(fi, o5, m5, num_levels=6)
            out = resize_bilinear(jnp.clip(blended, 0.0, 255.0), hw)
            out = jnp.where(valid[:, None, None, None], out, ori)
            return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)

        ref5 = jnp.asarray(self.reference_5pts)

        @jax.jit
        def detect_tfms(vars_retina, fc_u8):
            """Detect + closed-form device umeyama: the small head program
            of the split (>=1024) path. Returns (tfms, small, valid) — all
            tiny device arrays chained into the next stage."""
            x = fc_u8.astype(jnp.float32)
            bgr = x[..., ::-1] - jnp.asarray(RETINA_MEAN)
            boxes, landms, valid = detect_faces(
                retina_fwd(vars_retina, bgr), fc_u8.shape[1:3], threshold)
            tfms, _ = umeyama_similarity_batched(landms, ref5)
            small = jnp.minimum(boxes[:, 2] - boxes[:, 0],
                                boxes[:, 3] - boxes[:, 1]) < 100
            return tfms, small, valid

        @jax.jit
        def paste_fwd(ef, tmp_mask, mask_sharp512, tfms, out_shape_like):
            """The fused path's paste, program-split: ``tfms`` maps frame->
            crop, applied with inverse=True — bit-identical math to the
            corresponding lines of ``enhance_full`` (no re-inversion, so
            the split path's uint8 output equals the fused program's)."""
            hw = out_shape_like.shape[1:3]
            ms = resize_bilinear(mask_sharp512, (s, s))
            packed = warp(
                jnp.concatenate(
                    [ef.astype(jnp.float32), tmp_mask, ms], axis=-1),
                tfms, hw, inverse=True)
            return (packed[..., :3], packed[..., 3:4],
                    gaussian_blur(packed[..., 4:5], 9, 1.0))

        @functools.partial(jax.jit, static_argnums=(0, 1))
        def enhance_full(do_enhance, mode, vars_retina, vars_gan, vars_parse,
                         fc_u8, ori_u8, mb):
            """The whole per-chunk chain — detect, closed-form device
            umeyama (umeyama_similarity_batched), warp, GAN, parse, paste,
            composite — as ONE program with no host round-trip. ``mode`` is
            a static string: 'sr' | 'possion' | 'possion_nobbox' |
            'default'. Invalid frames fall through to ``ori`` exactly like
            the host path (identity transforms there, jnp.where here)."""
            x = fc_u8.astype(jnp.float32)
            bgr = x[..., ::-1] - jnp.asarray(RETINA_MEAN)
            boxes, landms, valid = detect_faces(
                retina_fwd(vars_retina, bgr), fc_u8.shape[1:3], threshold)
            tfms, _ = umeyama_similarity_batched(landms, ref5)
            small = jnp.minimum(boxes[:, 2] - boxes[:, 0],
                                boxes[:, 3] - boxes[:, 1]) < 100
            ef, tmp_mask, ms512 = faces_and_masks(
                vars_gan, vars_parse, fc_u8, tfms, small, do_enhance)
            hw = fc_u8.shape[1:3]
            # tfm maps frame->crop; inverse=True makes it the paste warp.
            # One 5-channel warp instead of three (descriptor count, not
            # channel count, is what gathers pay for).
            ms = resize_bilinear(ms512, (s, s))
            packed = warp(
                jnp.concatenate(
                    [ef.astype(jnp.float32), tmp_mask, ms], axis=-1),
                tfms, hw, inverse=True)
            tmp_img = packed[..., :3]
            full_mask = packed[..., 3:4]
            mask_sharp_w = gaussian_blur(packed[..., 4:5], 9, 1.0)
            if mode == "sr":
                return composite_sr(ori_u8, tmp_img, full_mask, valid)
            if mode == "possion":
                return composite_laplacian(
                    ori_u8, tmp_img, mask_sharp_w * mb, valid)
            if mode == "possion_nobbox":
                # no bboxes: the reference blends with the postprocessed
                # full_mask, not mask_sharp (face_enhancement.py:186-187)
                return composite_laplacian(ori_u8, tmp_img, full_mask, valid)
            return composite_default(
                ori_u8, tmp_img, full_mask, mask_sharp_w, valid)

        @functools.partial(jax.jit, static_argnums=(0, 1))
        def enhance_full_lm(do_enhance, mode, vars_gan, vars_parse,
                            fc_u8, ori_u8, mb, lms5, small):
            """``enhance_full`` with the detection geometry supplied by the
            caller (config model.reuse_detections): the pipeline's own
            S3FD+FAN landmark sweeps already located the face, so the
            RetinaFace pass is dropped from the program entirely. All
            frames are treated as valid — the supplying sweep raises on
            undetected faces (pipeline/inference.py detect contract)."""
            tfms, _ = umeyama_similarity_batched(lms5, ref5)
            ef, tmp_mask, ms512 = faces_and_masks(
                vars_gan, vars_parse, fc_u8, tfms, small, do_enhance)
            hw = fc_u8.shape[1:3]
            ms = resize_bilinear(ms512, (s, s))
            packed = warp(
                jnp.concatenate(
                    [ef.astype(jnp.float32), tmp_mask, ms], axis=-1),
                tfms, hw, inverse=True)
            tmp_img = packed[..., :3]
            full_mask = packed[..., 3:4]
            mask_sharp_w = gaussian_blur(packed[..., 4:5], 9, 1.0)
            valid = jnp.ones((fc_u8.shape[0],), bool)
            if mode == "sr":
                return composite_sr(ori_u8, tmp_img, full_mask, valid)
            if mode == "possion":
                return composite_laplacian(
                    ori_u8, tmp_img, mask_sharp_w * mb, valid)
            if mode == "possion_nobbox":
                return composite_laplacian(ori_u8, tmp_img, full_mask, valid)
            return composite_default(
                ori_u8, tmp_img, full_mask, mask_sharp_w, valid)

        @jax.jit
        def lm_tfms(lms5, small):
            """Supplied-landmark twin of ``detect_tfms`` for the split
            (>=1024) path: same (tfms, small, valid) triple, no detector."""
            tfms, _ = umeyama_similarity_batched(lms5, ref5)
            return tfms, small, jnp.ones((lms5.shape[0],), bool)

        self._detect = detect
        self._detect_tfms = detect_tfms
        self._lm_tfms = lm_tfms
        self._enhance_full_lm = enhance_full_lm
        self._paste_fwd = paste_fwd
        # ONE fused program per chunk compiles fine up to 512^2 crops but
        # the 2048 configuration consistently aborts the remote compile
        # helper after ~90-105 s (v5e relay probe 2026-08; each piece
        # compiles in <11 s alone) — an apparent compile-time cap. The
        # split path chains the same pieces as 4 device programs with no
        # host round-trip, so it costs only extra dispatches.
        self._fuse_full = in_size <= 512
        self._sr = sr
        self._up2 = {}
        self._faces_and_masks = faces_and_masks
        self._paste = paste
        self._composite_sr = composite_sr
        self._composite_default = composite_default
        self._composite_laplacian = composite_laplacian
        self._enhance_full = enhance_full

    # ------------------------------------------------------------------

    def _transforms(self, landms: np.ndarray, boxes: np.ndarray,
                    valid: np.ndarray):
        """Per-frame umeyama solves (host; ~microseconds each)."""
        n = len(landms)
        tfms = np.zeros((n, 2, 3), np.float32)
        tfm_invs = np.zeros((n, 2, 3), np.float32)
        small = np.zeros((n,), bool)
        for i in range(n):
            if not valid[i]:
                tfms[i] = tfm_invs[i] = np.asarray(
                    [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
                continue
            tfm, tfm_inv = warp_and_crop_transforms(
                landms[i].astype(np.float64), self.reference_5pts)
            tfms[i], tfm_invs[i] = tfm, tfm_inv
            fw = boxes[i][2] - boxes[i][0]
            fh = boxes[i][3] - boxes[i][1]
            small[i] = min(fh, fw) < 100  # face_enhancement.py:153
        return tfms, tfm_invs, small

    def _enhance_split(self, do_enhance: bool, mode: str, fc_u8, ori_u8, mb,
                       geo=None):
        """The enhance_full chain as four chained device programs
        (detect+umeyama -> faces_and_masks -> paste -> composite) for crop
        sizes whose single fused program aborts the compile helper (see
        ``_fuse_full``). Inputs/outputs and semantics are identical to
        ``_enhance_full``; intermediates never leave the device, so the
        only extra cost is three async dispatches per chunk. ``geo`` is an
        optional caller-supplied (lms5, small) pair replacing the RetinaFace
        head (config model.reuse_detections)."""
        if geo is not None:
            tfms, small, valid = self._lm_tfms(*geo)
        else:
            tfms, small, valid = self._detect_tfms(
                self.models["retinaface"], fc_u8)
        ef, tmp_mask, ms512 = self._faces_and_masks(
            self.models["facegan"], self.models["parsenet"], fc_u8, tfms,
            small, bool(do_enhance))
        tmp_img, full_mask, mask_sharp_w = self._paste_fwd(
            ef, tmp_mask, ms512, tfms, ori_u8)
        if mode == "sr":
            return self._composite_sr(ori_u8, tmp_img, full_mask, valid)
        if mode == "possion":
            return self._composite_laplacian(
                ori_u8, tmp_img, mask_sharp_w * mb, valid)
        if mode == "possion_nobbox":
            return self._composite_laplacian(
                ori_u8, tmp_img, full_mask, valid)
        return self._composite_default(
            ori_u8, tmp_img, full_mask, mask_sharp_w, valid)

    def process_batch(self, frames_rgb,
                      ori_frames=None,
                      face_enhance: bool = True,
                      possion_blending: bool = False,
                      bboxes: Optional[np.ndarray] = None,
                      device_out: bool = False,
                      landmarks5=None,
                      det_boxes=None):
        """Batched FaceEnhancement.process over a stack of frames.

        frames_rgb: [N, H, W, 3] uint8/float. ori_frames: the paste base
        (defaults to frames; the reference passes the 2x original frame in
        Step 6, inference.py:317-319). bboxes: [N, 4] (y1, y2, x1, x2)
        restricting the possion-blend mask (face_enhancement.py:181-184).

        ``landmarks5`` ([N, 5, 2] in frames_rgb pixel coords, RetinaFace
        point order — models/fan.py lm68_to_lm5 produces it from the
        pipeline's FAN sweeps) replaces the RetinaFace pass entirely
        (config model.reuse_detections); ``det_boxes`` [N, 4] (x1,y1,x2,y2)
        optionally supplies the small-face flag's box (all-large assumed
        when absent). Under ``use_sr`` the landmarks are given in the
        PRE-SR frame coordinates and scaled by ``sr_scale`` here (detection
        runs on the upscaled frame in the reference,
        face_enhancement.py:103-106).

        Returns [N, H', W', 3] uint8 — H' = sr_scale*H when ``use_sr``.

        Deviation from the reference: one (best) face per frame instead of
        the all-faces loop — the pipeline only ever processes single-face
        talking-head frames.
        """
        n = len(frames_rgb)
        # device-resident input: the fused path chunks with zero-transfer
        # device slices (pipeline.utils.device_chunker); the SR and
        # host-solver configurations still materialize on host
        dev_in = isinstance(frames_rgb, jnp.ndarray)
        if dev_in and (self.use_sr or "_transforms" in self.__dict__
                       or (ori_frames is not None
                           and not isinstance(ori_frames, jnp.ndarray))):
            frames_rgb = np.asarray(frames_rgb)
            dev_in = False
        if dev_in:
            x = jnp.clip(frames_rgb, 0, 255).astype(jnp.uint8)
        else:
            x = np.ascontiguousarray(
                np.clip(frames_rgb, 0, 255).astype(np.uint8))

        if self.use_sr:
            # SR the full frame, then run detection on the bilinear-upscaled
            # frame (face_enhancement.py:103-106)
            sh = (x.shape[1] * self.sr_scale, x.shape[2] * self.sr_scale)
            if sh not in self._up2:
                self._up2[sh] = jax.jit(lambda c: jnp.clip(
                    resize_bilinear(c.astype(jnp.float32), sh),
                    0, 255).astype(jnp.uint8))
            up2 = self._up2[sh]
            img_sr = self._chunked(
                lambda c: self._sr(self.models["srmodel"], jnp.asarray(c)), x)
            x = self._chunked(lambda c: up2(jnp.asarray(c)), x)
        else:
            img_sr = None

        if ori_frames is None:
            ori = x
        elif isinstance(ori_frames, jnp.ndarray):
            ori = jnp.clip(ori_frames, 0, 255).astype(jnp.uint8)
        else:
            ori = np.ascontiguousarray(
                np.clip(ori_frames, 0, 255).astype(np.uint8))

        lm_geo = None
        if landmarks5 is not None and "_transforms" not in self.__dict__:
            lms = np.asarray(landmarks5, np.float32)
            if self.use_sr:
                lms = lms * float(self.sr_scale)
            if det_boxes is not None:
                bb5 = np.asarray(det_boxes, np.float32)
                if self.use_sr:
                    bb5 = bb5 * float(self.sr_scale)
                small_np = np.minimum(bb5[:, 2] - bb5[:, 0],
                                      bb5[:, 3] - bb5[:, 1]) < 100
            else:
                small_np = np.zeros((n,), bool)
            lm_geo = (lms, small_np)

        if "_transforms" not in self.__dict__:
            # fused path: detect + device umeyama + enhance + composite as
            # one program per chunk, all chunks dispatched asynchronously
            mode = ("sr" if self.use_sr
                    else ("possion" if bboxes is not None
                          else "possion_nobbox") if possion_blending
                    else "default")
            from s2v_tpu.pipeline.utils import device_chunker

            k = min(self.chunk, n)
            cx = device_chunker(x, k)
            if self.use_sr:
                cori = device_chunker(np.asarray(img_sr), k)
            elif ori is x:
                cori = cx
            else:
                cori = device_chunker(ori, k)
            pending = []
            for i in range(0, n, k):
                sl = slice(i, min(i + k, n))
                pad = k - (sl.stop - sl.start)
                if mode == "possion" and bboxes is not None:
                    bb = np.asarray(bboxes)[sl]
                    if pad:
                        bb = np.concatenate(
                            [bb, np.repeat(bb[-1:], pad, 0)])
                    mb = np.zeros((k, *ori.shape[1:3], 1), np.float32)
                    for j in range(k):
                        y1, y2, x1, x2 = [int(t) for t in bb[j]]
                        mb[j, y1 : max(y2 - 5, y1), x1:x2] = 1.0
                else:
                    mb = np.ones((1, 1, 1, 1), np.float32)
                if lm_geo is not None:
                    def ixh(a):
                        c = a[sl]
                        return (np.concatenate(
                            [c, np.repeat(c[-1:], pad, 0)]) if pad else c)
                    geo = (self._place(jnp.asarray(ixh(lm_geo[0]))),
                           self._place(jnp.asarray(ixh(lm_geo[1]))))
                    if self._fuse_full:
                        pending.append((sl, self._enhance_full_lm(
                            bool(face_enhance), mode,
                            self.models["facegan"], self.models["parsenet"],
                            self._place(cx(i)), self._place(cori(i)),
                            jnp.asarray(mb), *geo)))
                    else:
                        pending.append((sl, self._enhance_split(
                            bool(face_enhance), mode, self._place(cx(i)),
                            self._place(cori(i)), jnp.asarray(mb),
                            geo=geo)))
                elif self._fuse_full:
                    pending.append((sl, self._enhance_full(
                        bool(face_enhance), mode, self.models["retinaface"],
                        self.models["facegan"], self.models["parsenet"],
                        self._place(cx(i)), self._place(cori(i)),
                        jnp.asarray(mb),
                    )))
                else:
                    pending.append((sl, self._enhance_split(
                        bool(face_enhance), mode, self._place(cx(i)),
                        self._place(cori(i)), jnp.asarray(mb))))
            if device_out:
                return jnp.concatenate(
                    [res[: sl.stop - sl.start] for sl, res in pending])
            out = np.zeros(
                (n, *(img_sr.shape[1:3] if self.use_sr else ori.shape[1:3]),
                 3), np.uint8)
            for sl, res in pending:
                out[sl] = np.asarray(res)[: sl.stop - sl.start]
            return out

        # harness-supplied transform solver: two async phases with the host
        # solve in between
        dk = min(max(self.chunk, 4), n)
        det = []
        for i in range(0, n, dk):
            c = x[i : i + dk]
            pad = dk - len(c)
            if pad:
                c = np.concatenate([c, np.repeat(c[-1:], pad, 0)])
            det.append((pad, self._detect(
                self.models["retinaface"], jnp.asarray(c))))
        boxes = np.concatenate([np.asarray(b)[: dk - p] for p, (b, l, v) in det])
        landms = np.concatenate([np.asarray(l)[: dk - p] for p, (b, l, v) in det])
        valid = np.concatenate([np.asarray(v)[: dk - p] for p, (b, l, v) in det])

        tfms, tfm_invs, small = self._transforms(landms, boxes, valid)

        # phase 2: dispatch every enhance/paste/composite chain, collect last
        k = min(self.chunk, n)
        pending = []
        for i in range(0, n, k):
            sl = slice(i, min(i + k, n))
            pad = k - (sl.stop - sl.start)
            ix = lambda a: np.concatenate(
                [a[sl], np.repeat(a[sl.stop - 1 : sl.stop], pad, 0)]
            ) if pad else a[sl]
            fc = jnp.asarray(ix(x))
            ef, tmp_mask, ms512 = self._faces_and_masks(
                self.models["facegan"], self.models["parsenet"], fc,
                jnp.asarray(ix(tfms)), jnp.asarray(ix(small)),
                bool(face_enhance),
            )
            tmp_img, full_mask, mask_sharp_w = self._paste(
                ef, tmp_mask, ms512, jnp.asarray(ix(tfm_invs)), fc
            )
            v = jnp.asarray(ix(valid))
            if self.use_sr:
                res = self._composite_sr(
                    jnp.asarray(ix(np.asarray(img_sr))), tmp_img, full_mask, v
                )
            elif possion_blending:
                # no bboxes: blend with the postprocessed full_mask
                # (face_enhancement.py:186-187)
                blend_mask = full_mask
                if bboxes is not None:
                    bb = ix(np.asarray(bboxes))
                    mb = np.zeros((k, *ori.shape[1:3], 1), np.float32)
                    for j in range(k):
                        y1, y2, x1, x2 = [int(t) for t in bb[j]]
                        mb[j, y1 : max(y2 - 5, y1), x1:x2] = 1.0
                    blend_mask = mask_sharp_w * jnp.asarray(mb)
                res = self._composite_laplacian(
                    jnp.asarray(ix(ori)), tmp_img, blend_mask, v
                )
            else:
                res = self._composite_default(
                    jnp.asarray(ix(ori)), tmp_img, full_mask, mask_sharp_w, v
                )
            pending.append((sl, res))

        out = np.zeros(
            (n, *(img_sr.shape[1:3] if self.use_sr else ori.shape[1:3]), 3),
            np.uint8,
        )
        for sl, res in pending:
            out[sl] = np.asarray(res)[: sl.stop - sl.start]
        return out

    def _chunked(self, fn, x: np.ndarray) -> np.ndarray:
        """Apply a device program over fixed-size chunks with tail padding,
        dispatching every chunk before reading any back (async overlap)."""
        n, k = len(x), min(self.chunk, len(x))
        pending = []
        for i in range(0, n, k):
            c = x[i : i + k]
            pad = k - len(c)
            if pad:
                c = np.concatenate([c, np.repeat(c[-1:], pad, 0)])
            pending.append((pad, fn(c)))
        return np.concatenate(
            [np.asarray(r)[: k - pad] for pad, r in pending])

    def __call__(self, frame_rgb: np.ndarray, face_enhance: bool = True,
                 laplacian_blend: bool = False,
                 bbox=None) -> np.ndarray:
        """Single-frame convenience wrapper around process_batch."""
        return self.process_batch(
            frame_rgb[None], face_enhance=face_enhance,
            possion_blending=laplacian_blend,
            bboxes=None if bbox is None else np.asarray(bbox)[None],
        )[0]
