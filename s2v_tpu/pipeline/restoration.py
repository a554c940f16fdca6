"""Step-6 restoration hooks: GFPGAN mouth-region restorer and GANimation
upper-face editing (reference: inference.py:250-312).

``GFPGANRestorer`` mirrors GFPGANer.enhance(has_aligned=False,
only_center_face=True, paste_back=True) (GFPGAN/gfpgan/utils.py:97-143):
detect the center face, umeyama-align to the facexlib 512^2 template, run
GFPGANv1Clean, paste back with an affine inverse warp.

``make_mouth_restorer`` packages the reference's full Step-6 per-frame tail
(inference.py:299-312): GFPGAN restore -> ParseNet mouth mask on the face
box -> 512^2 10-level Laplacian blend of restored over pasted.

TPU-first: every stage is batched over the frame chunk — detection, the
affine warps (device-built grids, ops/warp.affine_warp), GFPGAN, ParseNet,
the box crop/paste (ops/warp.crop_resize_boxes / paste_resize_boxes) and the
Laplacian blend all run as [B]-shaped jitted programs; the host solves only
the per-frame 2x3 umeyama similarity. The reference loops frames on host
with one GPU call per frame (inference.py:292-312).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from s2v_tpu.ops.image import resize_bilinear
from s2v_tpu.ops.warp import (
    affine_warp,
    affine_warp_shear,
    crop_resize_boxes,
    paste_resize_boxes,
)
from s2v_tpu.pipeline.enhance import umeyama_with_scale
from s2v_tpu.pipeline.utils import laplacian_pyramid_blend

# facexlib FaceRestoreHelper 512^2 face template (utils.py/face_restoration_helper)
FACEXLIB_TEMPLATE_512 = np.array(
    [[192.98138, 239.94708], [318.90277, 240.1936], [256.63416, 314.01935],
     [201.26117, 371.41043], [313.08905, 371.15118]], np.float32,
)


class GFPGANRestorer:
    """GFPGANer equivalent. models: {'retinaface', 'gfpgan'} flax vars."""

    def __init__(self, models: Dict, threshold: float = 0.9,
                 arch: str = "clean", chunk: int = 16, size: int = 512,
                 gfpgan_kwargs: Optional[Dict] = None,
                 dtype: str = "bfloat16", approx_warp: bool = False,
                 det_dtype: str = "float32", mesh=None):
        from s2v_tpu.models.gfpgan import gfpgan_arch
        from s2v_tpu.models.retinaface import (
            RETINA_MEAN, detect_faces, retinaface_arch,
        )

        self.models = models
        self.chunk = chunk
        self.size = size  # reference is fixed 512 (gfpgan/utils.py:76-82)
        # multi-chip: frame-axis chunk sharding over the mesh's data axis
        # (same contract as LipSyncPipeline / FaceEnhancer)
        if mesh is not None:
            from s2v_tpu.parallel.mesh import shard_frames_if_divisible
            self._place = lambda c: shard_frames_if_divisible(c, mesh)
        else:
            self._place = lambda c: c
        self.template = FACEXLIB_TEMPLATE_512 * (size / 512.0)
        kw = dict(gfpgan_kwargs or {})
        # geometry (widths/style dims) from the converted checkpoint's
        # variable tree; arch + wiring flags stay config-chosen the way
        # gfpgan/utils.py:43-82 picks them per checkpoint file
        retina = retinaface_arch(models["retinaface"])
        if arch == "clean":
            gfpgan = gfpgan_arch(models["gfpgan"], arch="clean",
                                 out_size=size, **kw)
        else:  # 'original'/'bilinear': utils.py:63-74 GFPGANv1.pth config
            kw.setdefault("input_is_latent", True)
            kw.setdefault("different_w", True)
            kw.setdefault("sft_half", True)
            gfpgan = gfpgan_arch(models["gfpgan"], arch="original",
                                 out_size=size, **kw)

        # RetinaFace conv dtype (config model.detector_dtype): f32 default
        # matches the reference; bf16 runs the detector convs at MXU full
        # rate with sub-pixel box/landmark jitter. Decode stays f32.
        det_dt = jnp.bfloat16 if det_dtype == "bfloat16" else jnp.float32

        def retina_fwd(variables, bgr):
            outs = retina.apply(variables, bgr.astype(det_dt))
            return tuple(o.astype(jnp.float32) for o in outs)

        @jax.jit
        def detect(variables, frames_rgb):
            x = frames_rgb.astype(jnp.float32)
            bgr = x[..., ::-1] - jnp.asarray(RETINA_MEAN)
            return detect_faces(retina_fwd(variables, bgr),
                                frames_rgb.shape[1:3], threshold)

        s = size
        dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        # opt-in approx mode (config model.approx_warp): gather-free sheared
        # separable warps, documented quality delta (ops/warp.py
        # affine_warp_shear); the exact path stays the parity surface.
        warp = affine_warp_shear if approx_warp else affine_warp

        @jax.jit
        def restore_paste(variables, frames_in, tfms, tfm_invs, valid):
            """Align to the template crop, GFPGAN (bf16 compute),
            inverse-paste (utils.py:97-143) — one program per frame chunk.
            uint8 in / uint8 out: frames cross the relay at 1 byte/px."""
            frames = frames_in.astype(jnp.float32)
            face = warp(frames, tfms, (s, s))
            x = ((face / 255.0 - 0.5) / 0.5).astype(dt)
            out = gfpgan.apply(variables, x, deterministic=True)
            if isinstance(out, tuple):
                out = out[0]
            restored = jnp.clip(
                (out.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0) * 255.0
            hw = frames.shape[1:3]
            # fused 4-channel warp: restored RGB + the all-ones coverage
            # mask share one gather (channels are nearly free, descriptors
            # are not)
            packed = warp(
                jnp.concatenate(
                    [restored,
                     jnp.ones((frames.shape[0], s, s, 1), jnp.float32)],
                    axis=-1),
                tfm_invs, hw)
            pasted, mask = packed[..., :3], packed[..., 3:4]
            out = pasted * mask + frames * (1.0 - mask)
            out = jnp.where(valid[:, None, None, None], out, frames)
            return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)

        from s2v_tpu.pipeline.enhance import umeyama_similarity_batched

        template_d = jnp.asarray(self.template)

        @jax.jit
        def restore_full(vars_retina, vars_gfpgan, frames_u8):
            """Detect + umeyama align + GFPGAN + inverse paste as ONE
            program — the alignment solve runs on-device (closed-form
            similarity, enhance.umeyama_similarity_batched), so the chain
            has no host sync between detection and restoration."""
            frames = frames_u8.astype(jnp.float32)
            bgr = frames[..., ::-1] - jnp.asarray(RETINA_MEAN)
            boxes, landms, valid = detect_faces(
                retina_fwd(vars_retina, bgr), frames_u8.shape[1:3],
                threshold)
            tfms, _ = umeyama_similarity_batched(landms, template_d)
            face = warp(frames, tfms, (s, s))
            x = ((face / 255.0 - 0.5) / 0.5).astype(dt)
            out = gfpgan.apply(vars_gfpgan, x, deterministic=True)
            if isinstance(out, tuple):
                out = out[0]
            restored = jnp.clip(
                (out.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0) * 255.0
            hw = frames.shape[1:3]
            # tfm maps frame->crop: passing it with inverse=True IS the
            # paste-back warp (no explicit 2x3 inversion needed). RGB and
            # the coverage mask share one 4-channel gather.
            packed = warp(
                jnp.concatenate(
                    [restored,
                     jnp.ones((frames.shape[0], s, s, 1), jnp.float32)],
                    axis=-1),
                tfms, hw, inverse=True)
            pasted, mask = packed[..., :3], packed[..., 3:4]
            out = pasted * mask + frames * (1.0 - mask)
            out = jnp.where(valid[:, None, None, None], out, frames)
            return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)

        @jax.jit
        def restore_full_lm(vars_gfpgan, frames_u8, lms5):
            """``restore_full`` with caller-supplied 5-point landmarks
            (config model.reuse_detections): the pipeline's FAN sweep
            already located the face, so the RetinaFace pass is dropped
            from the program. All frames are treated as valid — the
            supplying sweep raises on undetected faces."""
            frames = frames_u8.astype(jnp.float32)
            tfms, _ = umeyama_similarity_batched(lms5, template_d)
            face = warp(frames, tfms, (s, s))
            x = ((face / 255.0 - 0.5) / 0.5).astype(dt)
            out = gfpgan.apply(vars_gfpgan, x, deterministic=True)
            if isinstance(out, tuple):
                out = out[0]
            restored = jnp.clip(
                (out.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0) * 255.0
            hw = frames.shape[1:3]
            packed = warp(
                jnp.concatenate(
                    [restored,
                     jnp.ones((frames.shape[0], s, s, 1), jnp.float32)],
                    axis=-1),
                tfms, hw, inverse=True)
            pasted, mask = packed[..., :3], packed[..., 3:4]
            out = pasted * mask + frames * (1.0 - mask)
            return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)

        self._detect = detect
        self._restore_paste = restore_paste
        self._restore_full = restore_full
        self._restore_full_lm = restore_full_lm

    def _transforms(self, landms: np.ndarray, valid: np.ndarray):
        n = len(landms)
        tfms = np.zeros((n, 2, 3), np.float32)
        tfm_invs = np.zeros((n, 2, 3), np.float32)
        for i in range(n):
            if not valid[i]:
                tfms[i] = tfm_invs[i] = np.asarray(
                    [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
                continue
            params, _ = umeyama_with_scale(
                landms[i].astype(np.float64),
                self.template.astype(np.float64), True)
            tfms[i] = params[:2]
            tfm_invs[i] = np.linalg.inv(
                np.vstack([params[:2], [0, 0, 1]]))[:2]
        return tfms, tfm_invs

    def enhance_batch(self, frames_rgb, device_out: bool = False):
        """[N,H,W,3] uint8/float (host or device-resident uint8) -> restored
        uint8 frames, batched.

        Two async phases: ALL detection chunks are dispatched before any
        result is read back (transfers overlap compute), the host solves the
        per-frame umeyama, then all restore programs are dispatched. With
        ``device_out`` the result stays on device (one [N,...] array) for
        callers that keep chaining programs."""
        n = len(frames_rgb)
        if isinstance(frames_rgb, np.ndarray):
            x = jnp.asarray(np.ascontiguousarray(
                np.clip(frames_rgb, 0, 255).astype(np.uint8)))
        else:
            x = frames_rgb.astype(jnp.uint8)
        k = min(self.chunk, n)
        slices, chunks_dev = [], []
        for i in range(0, n, k):
            sl = slice(i, min(i + k, n))
            c = x[sl]
            pad = k - (sl.stop - sl.start)
            if pad:
                c = jnp.concatenate([c, jnp.repeat(c[-1:], pad, 0)])
            slices.append((sl, pad))
            chunks_dev.append(self._place(c))

        if "_transforms" not in self.__dict__:
            # fused single-program path: detect + device umeyama + restore
            res_pending = [self._restore_full(
                self.models["retinaface"], self.models["gfpgan"], cj)
                for cj in chunks_dev]
        else:
            # a harness supplied its own transform solver — two async
            # phases with the host solve in between
            det_pending = [self._detect(self.models["retinaface"], c)
                           for c in chunks_dev]
            res_pending = []
            for (sl, pad), cj, det in zip(slices, chunks_dev, det_pending):
                boxes, landms, valid = det
                tfms, tfm_invs = self._transforms(
                    np.asarray(landms), np.asarray(valid))
                res_pending.append(self._restore_paste(
                    self.models["gfpgan"], cj, jnp.asarray(tfms),
                    jnp.asarray(tfm_invs), valid,
                ))

        if device_out:
            return jnp.concatenate(
                [r[: k - pad] for (sl, pad), r in zip(slices, res_pending)])
        out = np.zeros((n, *x.shape[1:]), np.uint8)
        for (sl, pad), res in zip(slices, res_pending):
            out[sl] = np.asarray(res)[: k - pad]
        return out

    def enhance(self, frame_rgb: np.ndarray) -> np.ndarray:
        """Single-frame wrapper (gfpgan/utils.py:97-143 with paste_back)."""
        return self.enhance_batch(frame_rgb[None])[0]


def make_mouth_restorer(models: Dict, chunk: int = 16,
                        approx_warp: bool = False,
                        det_dtype: str = "float32",
                        parse_size: int = 512,
                        parse_dtype: str = "float32",
                        mesh=None, size: int = 512,
                        gfpgan_kwargs: Optional[Dict] = None,
                        threshold: float = 0.9,
                        ) -> Optional[Callable]:
    """The reference's Step-6 per-frame tail (inference.py:299-312), batched.

    models needs 'retinaface' + 'gfpgan' + 'parsenet'. Returns
    hook(frames_rgb [B,H,W,3] float, boxes [B,4] (x1,y1,x2,y2)) -> [B,H,W,3]
    float — GFPGAN restore, ParseNet mouth mask on the face box, 10-level
    Laplacian blend at 512^2.
    """
    if not all(k in models and models[k] is not None
               for k in ("retinaface", "gfpgan", "parsenet")):
        return None

    from s2v_tpu.models.parsenet import MOUTH_COLORMAP, parse_mask, parsenet_arch

    restorer = GFPGANRestorer(models, arch=models.get("gfpgan_arch", "clean"),
                              chunk=chunk, approx_warp=approx_warp,
                              det_dtype=det_dtype, mesh=mesh, size=size,
                              gfpgan_kwargs=gfpgan_kwargs,
                              threshold=threshold)
    # geometry from the converted checkpoint (production widths) or a slim
    # test tree — same contract as LipSyncPipeline._enet_arch
    parser = parsenet_arch(models["parsenet"])
    # ParseNet working resolution + conv dtype (config model.parse_size /
    # model.detector_dtype): 512/f32 is the reference geometry; 256/bf16
    # quarters the parser's bandwidth floor and runs its convs at MXU full
    # rate. The argmax mouth mask is bilinearly resized to the face box by
    # paste_resize_boxes either way, so the delta is ~1px of mask-boundary
    # rounding before the Laplacian blend.
    ps = int(parse_size)
    pdt = jnp.bfloat16 if parse_dtype == "bfloat16" else jnp.float32

    @jax.jit
    def mouth_blend(variables, restored, ff, boxes):
        """restored/ff [B,H,W,3] 0..255; boxes [B,4] (x1,y1,x2,y2).

        ParseNet mouth mask from the restored face box (inference.py:304-308)
        pasted into a zero canvas, then the 10-level 512^2 Laplacian blend of
        restored over the original (inference.py:310-312).
        """
        restored = restored.astype(jnp.float32)
        ff = ff.astype(jnp.float32)
        b, h, w, _ = ff.shape
        cropp = crop_resize_boxes(restored, boxes, (ps, ps))
        logits, _ = parser.apply(
            variables, (cropp / 255.0 * 2.0 - 1.0).astype(pdt))
        mm = parse_mask(logits.astype(jnp.float32),
                        MOUTH_COLORMAP)[..., None]  # [B,ps,ps,1]
        canvas = jnp.zeros((b, h, w, 1), jnp.float32)
        mouse_mask = paste_resize_boxes(canvas, mm / 255.0, boxes)

        r512 = resize_bilinear(restored, (512, 512))
        f512 = resize_bilinear(ff, (512, 512))
        m512 = resize_bilinear(mouse_mask, (512, 512))
        blended = laplacian_pyramid_blend(r512, f512, m512, num_levels=10)
        out = resize_bilinear(jnp.clip(blended, 0.0, 255.0), (h, w))
        return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)

    @jax.jit
    def mouth_full(vars_retina, vars_gfpgan, vars_parse, frames_u8, boxes):
        """The ENTIRE Step-6 tail — RetinaFace detect, device umeyama,
        GFPGAN restore, inverse paste, ParseNet mouth mask, 10-level
        Laplacian blend — as one program: one dispatch + one uint8
        download per frame batch."""
        restored = restorer._restore_full(vars_retina, vars_gfpgan,
                                          frames_u8)
        return mouth_blend(vars_parse, restored, frames_u8, boxes)

    @jax.jit
    def mouth_full_lm(vars_gfpgan, vars_parse, frames_u8, boxes, lms5):
        """``mouth_full`` with the pipeline's own FAN landmarks standing in
        for the RetinaFace pass (config model.reuse_detections)."""
        restored = restorer._restore_full_lm(vars_gfpgan, frames_u8, lms5)
        return mouth_blend(vars_parse, restored, frames_u8, boxes)

    def hook(frames, boxes: np.ndarray, landmarks5=None) -> np.ndarray:
        """frames [B,H,W,3] uint8/float 0..255 (host or device-resident);
        boxes [B,4] (x1,y1,x2,y2). The whole tail — GFPGAN restore, ParseNet
        mouth mask, Laplacian blend — chains on device; the blended frames
        cross the link once, as uint8. ``landmarks5`` [B,5,2] (frame pixel
        coords, RetinaFace point order) skips the tail's own RetinaFace
        pass (config model.reuse_detections)."""
        if isinstance(frames, np.ndarray):
            frames_u8 = jnp.asarray(np.ascontiguousarray(
                np.clip(frames, 0, 255).astype(np.uint8)))
        else:
            frames_u8 = frames.astype(jnp.uint8)
        n = len(frames)
        k = min(chunk, n)
        boxes_d = jnp.asarray(np.asarray(boxes, np.float32))
        fused = "_transforms" not in restorer.__dict__
        if not fused:
            landmarks5 = None  # harness solver path keeps its own detect
        lms_d = (None if landmarks5 is None
                 else jnp.asarray(np.asarray(landmarks5, np.float32)))
        restored = (None if fused else
                    restorer.enhance_batch(frames_u8, device_out=True))
        pending = []
        for i in range(0, n, k):
            sl = slice(i, min(i + k, n))
            pad = k - (sl.stop - sl.start)
            ix = lambda a: jnp.concatenate(
                [a[sl], jnp.repeat(a[sl.stop - 1 : sl.stop], pad, 0)]
            ) if pad else a[sl]
            if fused and lms_d is not None:
                res = mouth_full_lm(
                    models["gfpgan"], models["parsenet"],
                    restorer._place(ix(frames_u8)),
                    restorer._place(ix(boxes_d)),
                    restorer._place(ix(lms_d)))
            elif fused:
                res = mouth_full(
                    models["retinaface"], models["gfpgan"],
                    models["parsenet"], restorer._place(ix(frames_u8)),
                    restorer._place(ix(boxes_d)))
            else:
                res = mouth_blend(
                    models["parsenet"], ix(restored), ix(frames_u8),
                    ix(boxes_d))
            pending.append((sl, res))
        out = np.zeros((n, *frames_u8.shape[1:]), np.uint8)
        for sl, res in pending:
            out[sl] = np.asarray(res)[: sl.stop - sl.start]
        return out

    # exposed for device-time accounting (bench.py devtime): the fused
    # one-dispatch program behind the hook
    hook.mouth_full = mouth_full
    hook.mouth_full_lm = mouth_full_lm
    hook.restorer = restorer
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
