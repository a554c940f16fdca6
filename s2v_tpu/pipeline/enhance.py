"""GPEN FaceEnhancement orchestration (reference:
third_part/GPEN/face_enhancement.py:48-193 + align_faces.py).

Flow per frame: RetinaFace detect (best face + 5 landmarks) -> umeyama
similarity warp to the reference facial points -> FullGenerator (GAN
enhance) -> ParseNet face mask -> border-zero + double-gaussian mask
postprocess -> inverse affine paste -> composite (direct, SR-composite, or
Laplacian-pyramid blend — the reference's "possion_blending" path,
face_enhancement.py:177-189).

TPU-first: detection, GAN, parsing and all warps are batched jitted
programs; per-frame host work is limited to the 2x3 similarity solves.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from s2v_tpu.ops.warp import grid_sample_bilinear
from s2v_tpu.pipeline.utils import gaussian_blur, laplacian_pyramid_blend

# align_faces.py:14-22
REFERENCE_FACIAL_POINTS = np.array(
    [[30.29459953, 51.69630051], [65.53179932, 51.50139999],
     [48.02519989, 71.73660278], [33.54930115, 92.3655014],
     [62.72990036, 92.20410156]], np.float32,
)
DEFAULT_CROP_SIZE = (96, 112)


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
    index space."""
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


class FaceEnhancer:
    """FaceEnhancement equivalent with converted flax weights.

    models: dict with keys 'retinaface', 'facegan' (FullGenerator[SR]
    variables), 'parsenet', optional 'srmodel' (RRDBNet).
    """

    # face region colormap (face_enhancement.py:141)
    MM = [0, 255, 255, 255, 255, 255, 255, 255, 0, 0, 255, 255, 255, 0, 0, 0, 0, 0, 0]

    def __init__(self, models: dict, in_size: int = 512,
                 use_sr: bool = False, threshold: float = 0.9):
        from s2v_tpu.models.gpen import FullGenerator
        from s2v_tpu.models.parsenet import ParseNet, parse_mask
        from s2v_tpu.models.retinaface import (
            RETINA_MEAN, RetinaFace, detect_faces,
        )

        self.models = models
        self.in_size = in_size
        self.use_sr = use_sr
        self.threshold = threshold
        self.reference_5pts = get_reference_facial_points(
            (in_size, in_size), 0.25, (0, 0), True
        )

        retina = RetinaFace()
        facegan = FullGenerator(size=in_size)
        parser = ParseNet()

        @jax.jit
        def detect(variables, frames_rgb):
            bgr = frames_rgb[..., ::-1] - jnp.asarray(RETINA_MEAN)
            return detect_faces(retina.apply(variables, bgr),
                                frames_rgb.shape[1:3], threshold)

        @jax.jit
        def enhance(variables, faces_rgb):  # [B,S,S,3] 0..255
            x = faces_rgb / 255.0 * 2.0 - 1.0
            out = facegan.apply(variables, x, deterministic=True)
            return jnp.clip((out + 1.0) / 2.0, 0.0, 1.0) * 255.0

        @jax.jit
        def parse(variables, faces_rgb):  # [B,512,512,3] 0..255
            x = faces_rgb / 255.0 * 2.0 - 1.0
            logits, _ = parser.apply(variables, x)
            return parse_mask(logits, self.MM)

        self._detect = detect
        self._enhance = enhance
        self._parse = parse

    def __call__(self, frame_rgb: np.ndarray, face_enhance: bool = True,
                 laplacian_blend: bool = False,
                 bbox=None) -> np.ndarray:
        """Enhance the face in one frame (face_enhancement.py:92-193).

        frame_rgb: [H, W, 3] uint8. Returns the composited frame (uint8).
        """
        h, w = frame_rgb.shape[:2]
        x = jnp.asarray(frame_rgb[None].astype(np.float32))
        boxes, landms, valid = self._detect(self.models["retinaface"], x)
        if not bool(np.asarray(valid)[0]):
            return frame_rgb

        facial5 = np.asarray(landms)[0]
        tfm, tfm_inv = warp_and_crop_transforms(facial5, self.reference_5pts)

        grid = affine_sample_grid(
            np.vstack([tfm, [0, 0, 1]])[:2], (self.in_size, self.in_size), (h, w)
        )
        of = grid_sample_bilinear(x, jnp.asarray(grid)[None])  # [1,S,S,3]

        ef = self._enhance(self.models["facegan"], of) if face_enhance else of

        # parse mask at 512 then postprocess (border zero + double blur)
        from s2v_tpu.ops.image import resize_bilinear
        from s2v_tpu.pipeline.utils import mask_postprocess

        ef512 = resize_bilinear(ef, (512, 512))
        mask_sharp = self._parse(self.models["parsenet"], ef512) / 255.0
        tmp_mask = mask_postprocess(mask_sharp, thres=26)
        tmp_mask = resize_bilinear(tmp_mask[..., None], (self.in_size, self.in_size))

        # inverse warp enhanced face + masks back to frame coords
        inv_grid = jnp.asarray(
            affine_sample_grid(tfm_inv, (h, w), (self.in_size, self.in_size))
        )[None]
        tmp_img = grid_sample_bilinear(ef, inv_grid)[0]
        full_mask = grid_sample_bilinear(tmp_mask, inv_grid)[0]
        ms512 = resize_bilinear(mask_sharp[..., None], (self.in_size, self.in_size))
        mask_sharp_w = grid_sample_bilinear(ms512, inv_grid)[0]
        mask_sharp_w = gaussian_blur(mask_sharp_w[None], 3, 1.0)[0]

        ori = x[0]
        if laplacian_blend:
            m = full_mask
            if bbox is not None:
                y1, y2, x1, x2 = bbox
                mb = np.zeros((h, w, 1), np.float32)
                mb[y1 : max(y2 - 5, y1) , x1:x2] = 1.0
                m = mask_sharp_w * jnp.asarray(mb)
            full_img5 = resize_bilinear(tmp_img[None], (512, 512))
            ori5 = resize_bilinear(ori[None], (512, 512))
            m5 = resize_bilinear(m[None], (512, 512))
            blended = laplacian_pyramid_blend(full_img5, ori5, m5, num_levels=6)
            out = resize_bilinear(jnp.clip(blended, 0, 255), (h, w))[0]
        else:
            img = ori * (1 - full_mask) + tmp_img * full_mask
            out = ori * (1 - mask_sharp_w) + img * mask_sharp_w
        return np.clip(np.asarray(out), 0, 255).astype(np.uint8)
