"""Step-6 restoration hooks: GFPGAN mouth-region restorer and GANimation
upper-face editing (reference: inference.py:250-312).

``GFPGANRestorer`` mirrors GFPGANer.enhance(has_aligned=False,
only_center_face=True, paste_back=True) (GFPGAN/gfpgan/utils.py:97-143):
detect the center face, umeyama-align to the facexlib 512^2 template, run
GFPGANv1Clean, paste back with an affine inverse warp.

``make_mouth_restorer`` packages the reference's full Step-6 per-frame tail
(inference.py:299-312): GFPGAN restore -> ParseNet mouth mask on the face
box -> 512^2 10-level Laplacian blend of restored over pasted.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from s2v_tpu.ops.image import resize_bilinear
from s2v_tpu.ops.warp import grid_sample_bilinear
from s2v_tpu.pipeline.enhance import (
    affine_sample_grid,
    umeyama_with_scale,
)
from s2v_tpu.pipeline.utils import laplacian_pyramid_blend

# facexlib FaceRestoreHelper 512^2 face template (utils.py/face_restoration_helper)
FACEXLIB_TEMPLATE_512 = np.array(
    [[192.98138, 239.94708], [318.90277, 240.1936], [256.63416, 314.01935],
     [201.26117, 371.41043], [313.08905, 371.15118]], np.float32,
)


class GFPGANRestorer:
    """GFPGANer equivalent. models: {'retinaface', 'gfpgan'} flax vars."""

    def __init__(self, models: Dict, threshold: float = 0.9,
                 arch: str = "clean"):
        from s2v_tpu.models.gfpgan import GFPGANv1, GFPGANv1Clean
        from s2v_tpu.models.retinaface import (
            RETINA_MEAN, RetinaFace, detect_faces,
        )

        self.models = models
        retina = RetinaFace()
        if arch == "clean":
            gfpgan = GFPGANv1Clean()
        else:  # 'original'/'bilinear': utils.py:63-74 GFPGANv1.pth config
            gfpgan = GFPGANv1(input_is_latent=True, different_w=True,
                              sft_half=True, channel_multiplier=1)

        @jax.jit
        def detect(variables, frames_rgb):
            bgr = frames_rgb[..., ::-1] - jnp.asarray(RETINA_MEAN)
            return detect_faces(retina.apply(variables, bgr),
                                frames_rgb.shape[1:3], threshold)

        @jax.jit
        def restore(variables, faces_rgb):  # [B,512,512,3] 0..255
            x = faces_rgb / 255.0
            x = (x - 0.5) / 0.5
            out = gfpgan.apply(variables, x, deterministic=True)
            if isinstance(out, tuple):
                out = out[0]
            return jnp.clip((out + 1.0) / 2.0, 0.0, 1.0) * 255.0

        self._detect = detect
        self._restore = restore

    def enhance(self, frame_rgb: np.ndarray) -> np.ndarray:
        """gfpgan/utils.py:97-143 with paste_back. [H,W,3] uint8 -> uint8."""
        h, w = frame_rgb.shape[:2]
        x = jnp.asarray(frame_rgb[None].astype(np.float32))
        boxes, landms, valid = self._detect(self.models["retinaface"], x)
        if not bool(np.asarray(valid)[0]):
            return frame_rgb
        facial5 = np.asarray(landms)[0].astype(np.float64)

        params, _ = umeyama_with_scale(facial5, FACEXLIB_TEMPLATE_512, True)
        tfm = params[:2]
        grid = affine_sample_grid(tfm, (512, 512), (h, w))
        face = grid_sample_bilinear(x, jnp.asarray(grid)[None])
        restored = self._restore(self.models["gfpgan"], face)

        inv = np.linalg.inv(np.vstack([tfm, [0, 0, 1]]))[:2]
        inv_grid = jnp.asarray(affine_sample_grid(inv, (h, w), (512, 512)))[None]
        pasted = grid_sample_bilinear(restored, inv_grid)[0]
        mask = grid_sample_bilinear(
            jnp.ones((1, 512, 512, 1), jnp.float32), inv_grid
        )[0]
        out = pasted * mask + x[0] * (1.0 - mask)
        return np.clip(np.asarray(out), 0, 255).astype(np.uint8)


def make_mouth_restorer(models: Dict) -> Optional[Callable]:
    """The reference's Step-6 per-frame tail (inference.py:299-312).

    models needs 'retinaface' + 'gfpgan' + 'parsenet'. Returns
    hook(frame_rgb_float, (y1, y2, x1, x2)) -> frame_rgb_float.
    """
    if not all(k in models and models[k] is not None
               for k in ("retinaface", "gfpgan", "parsenet")):
        return None

    from s2v_tpu.models.parsenet import MOUTH_COLORMAP, ParseNet, parse_mask

    restorer = GFPGANRestorer(models, arch=models.get("gfpgan_arch", "clean"))
    parser = ParseNet()

    @jax.jit
    def parse(variables, faces_rgb):  # [B,512,512,3] 0..255
        xx = faces_rgb / 255.0 * 2.0 - 1.0
        logits, _ = parser.apply(variables, xx)
        return parse_mask(logits, MOUTH_COLORMAP)

    def hook(ff: np.ndarray, box) -> np.ndarray:
        y1, y2, x1, x2 = box
        h, w = ff.shape[:2]
        restored = restorer.enhance(np.clip(ff, 0, 255).astype(np.uint8))
        restored = restored.astype(np.float32)

        # mouth mask from the restored face box (inference.py:304-308)
        crop = restored[y1:y2, x1:x2]
        crop512 = resize_bilinear(jnp.asarray(crop[None]), (512, 512))
        mm = parse(models["parsenet"], crop512)  # [1,512,512] in {0,255}
        mm_box = np.asarray(
            resize_bilinear(mm[..., None], (y2 - y1, x2 - x1))
        )[0, :, :, 0] / 255.0
        mouse_mask = np.zeros((h, w), np.float32)
        mouse_mask[y1:y2, x1:x2] = mm_box

        r512 = resize_bilinear(jnp.asarray(restored[None]), (512, 512))
        f512 = resize_bilinear(jnp.asarray(ff[None].astype(np.float32)), (512, 512))
        m512 = resize_bilinear(jnp.asarray(mouse_mask[None, :, :, None]), (512, 512))
        blended = laplacian_pyramid_blend(r512, f512, m512, num_levels=10)
        out = resize_bilinear(jnp.clip(blended, 0, 255), (h, w))[0]
        return np.asarray(out)

    return hook


def make_up_face_editor(models: Dict, up_face: str) -> Optional[Callable]:
    """GANimation hook (inference.py:269-281): edit the 384^2 original faces
    before the masked composite. Returns hook(img_original [B,384,384,3]
    float 0..1) -> same shape."""
    if up_face == "original" or models.get("ganimation") is None:
        return None

    from s2v_tpu.models.ganimation import EXP_AUS, SplitGenerator, apply_expression

    gen = SplitGenerator()
    aus = np.asarray(EXP_AUS[up_face], np.float32)[None]

    @jax.jit
    def run(variables, faces01):  # [B,384,384,3] in 0..1
        b = faces01.shape[0]
        small = resize_bilinear(faces01 * 2.0 - 1.0, (128, 128))
        color, att, _ = gen.apply(
            variables, small, jnp.repeat(jnp.asarray(aus), b, axis=0)
        )
        fake = apply_expression(small, color, att)
        return jnp.clip(resize_bilinear(fake / 2.0 + 0.5, (384, 384)), 0.0, 1.0)

    def hook(img_original: np.ndarray) -> np.ndarray:
        return np.asarray(run(models["ganimation"], jnp.asarray(img_original)))

    return hook
