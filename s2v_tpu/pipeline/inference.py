"""End-to-end lip-sync pipeline (reference: inference.py main() +
preprocessing/facing.py Preprocessor).

TPU-first restructuring: the reference pushes one frame at a time through
seven torch model suites with host round-trips at every step. Here each
stage is a *batched jitted program over the whole clip* (or fixed-size frame
batches), and the host only does: video/audio IO, PIL-exact 3DMM alignment
(cheap geometry), and ffmpeg muxing.

Stage map (reference banners):
  Step 0  read frames                         -> io.video_io
  Step 1  FFHQ crop + 68 landmarks            -> S3FD + FAN, batched
  Step 2  3DMM coefficients                   -> align_img + ReconNet, batched
  Step 3  DNet stabilization (256^2)          -> batched DNet forward
  Step 4  mel spectrogram + per-frame chunks  -> audio.melspec
  Step 5  reference enhancement (GPEN)        -> pluggable enhancer hook
  Step 6  LNet/ENet synthesis + paste-back    -> batched ENet forward
          (+ GFPGAN mouth restoration / Laplacian blending when a restorer
          hook is configured)

Model weights are supplied as converted flax variables
(s2v_tpu.utils.weights); any stage whose weights are absent degrades
explicitly (landmarks can be supplied precomputed, enhancement hooks default
to identity).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from s2v_tpu.audio import mel_chunks_for_frames, melspectrogram
from s2v_tpu.audio.melspec import num_mel_chunks
from s2v_tpu.io.audio_io import load_wav
from s2v_tpu.io.video_io import VideoReader, VideoWriter, mux_audio
from s2v_tpu.models import DNet, ENet
from s2v_tpu.models.fan import (
    FAN,
    box_to_center_scale,
    crop_faces_batched,
    heatmaps_to_landmarks,
)
from s2v_tpu.models.resnet import ReconNet
from s2v_tpu.models.s3fd import BGR_MEAN, S3FD, best_boxes, pad_and_smooth_boxes
from s2v_tpu.ops.image import resize_bilinear
from s2v_tpu.pipeline.align import (
    compute_transform,
    crop_quad_params,
    ffhq_crop_box,
    quad_from_cxy,
)
from s2v_tpu.pipeline.face3d_prep import align_img
from s2v_tpu.pipeline.utils import find_crop_norm_ratio, transform_semantic
from s2v_tpu.utils.config import PipelineConfig

# Version of the Steps 1-5 artifact chain; shared by every stage's cache key
# so a bump invalidates the whole chain (not just the stage that changed).
_CACHE_VERSION = 3


@dataclass
class PipelineModels:
    """Converted flax variables per model; None disables the stage."""

    s3fd: Optional[Dict] = None
    fan: Optional[Dict] = None
    recon: Optional[Dict] = None
    dnet: Optional[Dict] = None
    enet: Optional[Dict] = None       # full ENet tree including low_res (LNet)
    lm3d: Optional[np.ndarray] = None  # [5, 3] standard landmarks
    expression: Optional[np.ndarray] = None  # [64] template coeffs
    ganimation: Optional[Dict] = None  # SplitGenerator variables (--up_face)
    # batched hooks for the restoration stack (GPEN / GFPGAN); None disables:
    # ref_enhancer(frames [N,256,256,3] u8) -> u8            (Step 5, GPEN-512)
    # mouth_restorer(frames [B,H,W,3] f32, boxes [B,4] x1y1x2y2) -> f32
    # final_enhancer(frames [B,H,W,3] f32, boxes [B,4]) -> [B,2H,2W,3] u8
    # up_face_editor(faces01 [B,384,384,3] f32) -> f32       (GANimation)
    ref_enhancer: Optional[Callable] = None
    final_enhancer: Optional[Callable] = None
    mouth_restorer: Optional[Callable] = None
    up_face_editor: Optional[Callable] = None


class LipSyncPipeline:
    def __init__(self, cfg: PipelineConfig, models: PipelineModels,
                 mesh=None):
        self.cfg = cfg
        self.models = models
        self._jits: Dict[str, Callable] = {}
        # compute dtype for the generator-stack programs (DNet/ENet): bf16
        # runs the MXU at full rate; params stay f32 and norm statistics
        # accumulate in f32 (ops/norms.py). Detection/regression nets
        # (S3FD/FAN/ReconNet) stay f32 — box/coefficient precision matters
        # and they are a small share of the FLOPs.
        self._dt = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32
        # detection/landmark conv dtype (decode stays f32 regardless)
        self._det_dt = (jnp.bfloat16
                        if getattr(cfg.model, "detector_dtype", "float32")
                        == "bfloat16" else jnp.float32)
        # multi-chip inference: a jax.sharding.Mesh shards the FRAME axis of
        # every stage program across the mesh's data axis (the rebuild's
        # sequence parallelism, SURVEY §7.8 — every model forward here is
        # per-frame independent, so batch-axis sharding is exact). Chunk
        # batch sizes should be multiples of the data-axis size.
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from s2v_tpu.parallel.mesh import DATA_AXIS

            self._frame_sh = NamedSharding(mesh, P(DATA_AXIS))

    def _dev(self, x) -> jnp.ndarray:
        """Chunk placement: plain asarray single-device; frame-axis sharded
        over the mesh's data axis when a mesh is configured."""
        if self.mesh is None:
            return jnp.asarray(x)
        return jax.device_put(x, self._frame_sh)

    def _require(self, *names: str):
        missing = [n for n in names if getattr(self.models, n) is None]
        if missing:
            raise RuntimeError(
                f"missing model weights for: {', '.join(missing)}. Point "
                "--checkpoint_dir at a directory with the reference "
                "checkpoints (s3fd.pth, 2DFAN4.pth, "
                "face3d_pretrain_epoch_20.pth, DNet.pt, LNet.pth, ENet.pth, "
                "BFM/, expression.mat) — they are converted on load."
            )

    # ------------------------------------------------------------------
    # Step 1: detection + landmarks (batched)
    # ------------------------------------------------------------------

    def _detect_fn(self):
        if "detect" not in self._jits:
            model = S3FD()

            det_dt = self._det_dt

            @jax.jit
            def run(variables, frames_rgb):  # [B,H,W,3] u8/float RGB 0..255
                bgr = frames_rgb.astype(jnp.float32)[..., ::-1] - jnp.asarray(
                    BGR_MEAN)
                outs = model.apply(variables, bgr.astype(det_dt))
                outs = jax.tree_util.tree_map(
                    lambda t: t.astype(jnp.float32), outs)
                return best_boxes(outs)

            self._jits["detect"] = run
        return self._jits["detect"]

    def _fan_fn(self):
        if "fan" not in self._jits:
            model = FAN()

            det_dt = self._det_dt

            @jax.jit
            def run(variables, frames_rgb, boxes):  # frames 0..255
                frames_rgb = frames_rgb.astype(jnp.float32)
                centers, scales = box_to_center_scale(boxes)
                crops = crop_faces_batched(frames_rgb, centers, scales)
                hm = model.apply(variables, crops.astype(det_dt))
                return heatmaps_to_landmarks(
                    hm.astype(jnp.float32), centers, scales)

            self._jits["fan"] = run
        return self._jits["fan"]

    def _landmark_fn(self):
        """Fused S3FD detect + FAN landmarks: ONE program per frame chunk —
        the frames cross the host->device link once instead of twice and the
        per-call dispatch cost is halved (KeypointExtractor makes two model
        calls per frame, face3d/extract_kp_videos.py:31-46)."""
        if "detect_fan" not in self._jits:
            s3fd = S3FD()
            fan = FAN()

            det_dt = self._det_dt

            @jax.jit
            def run(vars_s3fd, vars_fan, frames_rgb):
                x = frames_rgb.astype(jnp.float32)
                bgr = x[..., ::-1] - jnp.asarray(BGR_MEAN)
                outs = s3fd.apply(vars_s3fd, bgr.astype(det_dt))
                outs = jax.tree_util.tree_map(
                    lambda t: t.astype(jnp.float32), outs)
                boxes, valid = best_boxes(outs)
                centers, scales = box_to_center_scale(boxes)
                crops = crop_faces_batched(x, centers, scales)
                hm = fan.apply(vars_fan, crops.astype(det_dt))
                lms = heatmaps_to_landmarks(
                    hm.astype(jnp.float32), centers, scales)
                return boxes, valid, lms

            self._jits["detect_fan"] = run
        return self._jits["detect_fan"]

    def _dev_chunker(self, x, batch: int):
        """Fixed-size chunk provider over the frame axis (see
        pipeline.utils.device_chunker): host input uploads per chunk;
        device input serves zero-transfer dynamic slices. Chunks are mesh-
        resharded when a mesh is configured."""
        from s2v_tpu.pipeline.utils import device_chunker

        chunk = device_chunker(x, batch)
        if self.mesh is None and isinstance(x, jnp.ndarray):
            return chunk
        return lambda i: self._dev(chunk(i))

    @staticmethod
    def _collect(pending, n: int, device_out: bool = False):
        """Join chunk results: one device concat (device_out) or one
        host download per chunk."""
        if device_out:
            out = pending[0] if len(pending) == 1 else jnp.concatenate(
                pending)
            return out[:n]
        return np.concatenate([np.asarray(r) for r in pending])[:n]

    @staticmethod
    def _chunk_sweep(dispatch, n: int, batch: int):
        """Dispatch `dispatch(i0, chunk_slice)` for every fixed-size chunk
        WITHOUT syncing in between (JAX async dispatch overlaps the host->
        device transfers with device compute — on a relayed TPU the link is
        the bottleneck), then collect. Returns the list of device results."""
        pending = []
        for i in range(0, n, batch):
            pending.append((dispatch(i), batch - min(batch, n - i)))
        return [tuple(np.asarray(x)[: batch - pad] for x in r)
                if isinstance(r, tuple)
                else np.asarray(r)[: batch - pad]
                for r, pad in pending]

    @staticmethod
    def _pad_chunk(x: np.ndarray, i: int, batch: int):
        chunk = x[i : i + batch]
        pad = batch - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        return chunk

    def detect_boxes(self, frames_rgb: np.ndarray, batch: int = 32) -> np.ndarray:
        """[N,H,W,3] uint8 RGB -> [N,4] best face boxes (float, unclipped).

        On device OOM the batch is halved and the sweep restarts — the
        reference's face_detect backoff (inference_utils.py:110-128)."""
        self._require("s3fd")
        run = self._detect_fn()
        n = len(frames_rgb)
        while True:
            try:
                chunk = self._dev_chunker(frames_rgb, batch)
                res = self._chunk_sweep(
                    lambda i: run(self.models.s3fd, chunk(i)), n, batch)
                break
            except (RuntimeError, jax.errors.JaxRuntimeError) as e:
                if "RESOURCE_EXHAUSTED" not in str(e) or batch == 1:
                    raise
                batch //= 2
                print(f"Recovering from OOM error; New batch size: {batch}")
        boxes = np.concatenate([r[0] for r in res])
        ok = np.concatenate([r[1] for r in res])
        if not ok.all():
            # reference raises on undetected faces (inference_utils.py:132-134)
            bad = int(np.argmin(ok))
            raise ValueError(
                f"Face not detected in frame {bad}! Ensure the video contains "
                "a face in all the frames."
            )
        return boxes

    def extract_landmarks(self, frames_rgb: np.ndarray, batch: int = 32,
                          return_boxes: bool = False):
        """[N,H,W,3] uint8 RGB -> [N,68,2] landmarks (KeypointExtractor
        equivalent: S3FD box -> FAN heatmaps -> coords, fused into one
        program per chunk). With ``return_boxes`` also returns the S3FD
        boxes — callers that need both (Step 1 + Step 6 of run()) pay for
        one detection sweep instead of two."""
        self._require("s3fd", "fan")
        run = self._landmark_fn()
        n = len(frames_rgb)
        while True:
            try:
                chunk = self._dev_chunker(frames_rgb, batch)
                res = self._chunk_sweep(
                    lambda i: run(self.models.s3fd, self.models.fan,
                                  chunk(i)), n, batch)
                break
            except (RuntimeError, jax.errors.JaxRuntimeError) as e:
                if "RESOURCE_EXHAUSTED" not in str(e) or batch == 1:
                    raise
                batch //= 2
                print(f"Recovering from OOM error; New batch size: {batch}")
        boxes = np.concatenate([r[0] for r in res])
        ok = np.concatenate([r[1] for r in res])
        if not ok.all():
            bad = int(np.argmin(ok))
            raise ValueError(
                f"Face not detected in frame {bad}! Ensure the video contains "
                "a face in all the frames."
            )
        lms = np.concatenate([r[2] for r in res])
        return (lms, boxes) if return_boxes else lms

    def ffhq_crop(self, frames_rgb: np.ndarray, first_lm: np.ndarray,
                  frames_dev: Optional[jnp.ndarray] = None,
                  device_out: bool = False):
        """Step 1 crop (facing.py:74-86): first-frame FFHQ quad applied to
        all frames; returns (frames_256 [N,256,256,3] uint8, coordinates).

        With ``frames_dev`` (the device-resident clip) the crop+resize runs
        as one device program keyed on the (per-video static) crop bounds —
        the clip never re-crosses the host link. ``device_out`` keeps the
        256^2 crops on device for the downstream stages."""
        h, w = frames_rgb.shape[1:3]
        crop, quad = ffhq_crop_box(first_lm.astype(np.float64), (w, h), 512)
        clx, cly, crx, cry = crop
        lx, ly, rx, ry = [int(v) for v in quad]
        oy1 = cly + ly
        oy2 = min(cly + ry, h)
        ox1 = clx + lx
        ox2 = min(clx + rx, w)
        if frames_dev is not None:
            # absolute bounds of the double slice [cly:cry][ly:ry]
            y0, y1 = cly + ly, min(cly + ry, cry)
            x0, x1 = clx + lx, min(clx + rx, crx)
            key = ("ffhq_dev", y0, y1, x0, x1)
            if key not in self._jits:
                self._jits[key] = jax.jit(
                    lambda x: jnp.clip(resize_bilinear(
                        x[:, y0:y1, x0:x1].astype(jnp.float32), (256, 256)),
                        0, 255).astype(jnp.uint8))
            out = self._jits[key](frames_dev)
        else:
            cropped = frames_rgb[:, cly:cry, clx:crx][:, ly:ry, lx:rx]
            if "ffhq_resize" not in self._jits:
                self._jits["ffhq_resize"] = jax.jit(
                    lambda x: jnp.clip(
                        resize_bilinear(x.astype(jnp.float32), (256, 256)),
                        0, 255).astype(jnp.uint8))
            out = self._jits["ffhq_resize"](
                self._dev(np.ascontiguousarray(cropped)))
        frames_256 = out if device_out else np.asarray(out)
        return frames_256, (oy1, oy2, ox1, ox2)

    # ------------------------------------------------------------------
    # Step 2: 3DMM coefficients
    # ------------------------------------------------------------------

    def extract_coeffs(self, frames_256: np.ndarray, lm: np.ndarray,
                       batch: int = 32) -> np.ndarray:
        """facing.py:99-134: align to 224^2, ReconNet -> [N, 262] semantic
        (257 coeffs + 5 trans params). Alignment is host PIL (exact);
        the regressor forward is batched on device."""
        from PIL import Image

        self._require("recon", "lm3d")
        lm3d = self.models.lm3d
        n = len(frames_256)
        # uint8 across the link (PIL emits uint8 anyway); the /255
        # normalization happens on-device — 4x less H2D traffic than f32
        aligned = np.zeros((n, 224, 224, 3), np.uint8)
        trans_params = np.zeros((n, 5), np.float32)
        h = frames_256.shape[1]
        for i in range(n):
            lm_i = lm[i].copy()
            if np.mean(lm_i) == -1:  # no-face sentinel (facing.py:112-114)
                lm_i = (lm3d[:, :2] + 1) / 2.0
                lm_i = np.concatenate(
                    [lm_i[:, :1] * frames_256.shape[2], lm_i[:, 1:2] * h], 1
                )
            else:
                lm_i[:, -1] = h - 1 - lm_i[:, -1]
            tp, img_new, _ = align_img(
                Image.fromarray(frames_256[i]), lm_i, lm3d
            )
            aligned[i] = np.asarray(img_new, np.uint8)
            trans_params[i] = tp

        if "recon" not in self._jits:
            model = self._recon_arch(self.models.recon)
            self._jits["recon"] = jax.jit(
                lambda v, x: model.apply(v, x.astype(jnp.float32) / 255.0)
            )
        run = self._jits["recon"]
        coeffs = np.concatenate(self._chunk_sweep(
            lambda i: run(self.models.recon,
                          self._dev(self._pad_chunk(aligned, i, batch))),
            n, batch))  # [N, 257]
        return np.concatenate([coeffs, trans_params], axis=1)  # [N, 262]

    # ------------------------------------------------------------------
    # Step 3: DNet stabilization
    # ------------------------------------------------------------------

    def stabilize(self, frames_256, semantic: np.ndarray,
                  batch: int = 16, one_shot: bool = False,
                  device_out: bool = False):
        """facing.py:135-198: per-frame coeff window, expression hack,
        DNet -> stabilized 256^2 frames (uint8 RGB). ``frames_256`` may be
        device-resident; ``device_out`` keeps the result on device so the
        Step-5 enhancer chains without a host round-trip."""
        self._require("dnet", "expression")
        n = len(frames_256)
        expression = self.models.expression

        if "stab_coeffs" not in self._jits:
            @functools.partial(jax.jit, static_argnums=(2,))
            def stab_coeffs(sem, expr, one_shot_):
                # per-frame crop-norm ratio (facing.py:183): the reference
                # recomputes find_crop_norm_ratio per frame with the frame's
                # own coeff as source — batched here as one [N, N] argmin
                # instead of N eager device calls
                if one_shot_:
                    ratio = find_crop_norm_ratio(sem[0:1], sem)
                else:
                    alpha = 0.3
                    exp = sem[:, 80:144]
                    ang = sem[:, 224:227]
                    ed = jnp.mean(
                        jnp.abs(exp[None, :, :] - exp[:, None, :]), -1)
                    ad = jnp.mean(
                        jnp.abs(ang[None, :, :] - ang[:, None, :]), -1)
                    index = jnp.argmin(alpha * ed + (1 - alpha) * ad, axis=1)
                    ratio = sem[:, -3] / sem[index, -3]
                coeff = transform_semantic(sem, ratio)  # [N, 73, 26]
                return coeff.at[:, :64, :].set(expr[None, :, None])

            self._jits["stab_coeffs"] = stab_coeffs
        coeff = self._jits["stab_coeffs"](
            jnp.asarray(semantic),
            jnp.asarray(expression, jnp.float32), bool(one_shot),
        )

        if "dnet" not in self._jits:
            model = self._dnet_arch(self.models.dnet)
            dt = self._dt

            @jax.jit
            def run(v, img_u8, c):
                # u8 frames cross the link; trans_image + the uint8 output
                # quantization both happen on-device (4x less relay traffic)
                img = (img_u8.astype(jnp.float32) / 255.0 * 2.0 - 1.0).astype(dt)
                fake = model.apply(v, img, c.astype(dt))["fake_image"]
                fake = fake.astype(jnp.float32)
                return jnp.clip((fake + 1.0) / 2.0 * 255.0, 0, 255).astype(
                    jnp.uint8)

            self._jits["dnet"] = run
        run = self._jits["dnet"]

        src = frames_256
        if one_shot:
            xp = jnp if isinstance(src, jnp.ndarray) else np
            src = xp.repeat(src[0:1], n, axis=0)
        # coeff is already device-resident; transpose once on device
        coeff_t = jnp.transpose(coeff, (0, 2, 1))
        chunk_src = self._dev_chunker(src, batch)
        chunk_coeff = self._dev_chunker(coeff_t, batch)
        pending = [run(self.models.dnet, chunk_src(i), chunk_coeff(i))
                   for i in range(0, n, batch)]
        return self._collect(pending, n, device_out)

    # ------------------------------------------------------------------
    # Step 6: synthesis
    # ------------------------------------------------------------------

    @staticmethod
    def _recon_arch(recon_vars) -> ReconNet:
        """ReconNet geometry inferred from the variable tree — converted
        reference checkpoints are ResNet50 (networks.py:69-104); test
        fixtures may supply slim graphs."""
        try:
            bb = recon_vars["params"]["backbone"]
            base = int(bb["conv1"]["weight"].shape[-1])
            counts = [0, 0, 0, 0]
            for k in bb:
                if k.startswith("layer"):
                    counts[int(k[5]) - 1] += 1
            if not all(counts):
                return ReconNet()
            return ReconNet(layers=tuple(counts), base_planes=base)
        except (KeyError, TypeError, AttributeError, ValueError, IndexError):
            return ReconNet()

    @staticmethod
    def _dnet_arch(dnet_vars) -> DNet:
        """DNet geometry inferred from the variable tree — converted
        reference checkpoints are the production widths (DNet.py:13-28);
        test fixtures may supply slim graphs."""
        try:
            p = dnet_vars["params"]
            desc = int(p["mapping_net"]["first_weight"].shape[-1])
            hg = p["warpping_net"]["hourglass"]
            warp_base = int(hg["input_layer"]["weight"].shape[-1])
            max_nc = max(int(v["conv_0"]["weight"].shape[-1])
                         for k, v in hg.items() if k.startswith("encoder"))
            enc = p["editing_net"]["encoder"]
            edit_base = int(enc["first"]["conv"]["weight"].shape[-1])
            return DNet(descriptor_nc=desc, warp_base_nc=warp_base,
                        edit_base_nc=edit_base, max_nc=max_nc)
        except (KeyError, TypeError, AttributeError, ValueError):
            return DNet()

    @staticmethod
    def _enet_arch(enet_vars) -> ENet:
        """ENet geometry (LNet depth/width + StyleGAN channel table)
        inferred from the variable tree — converted reference checkpoints
        are the production geometry (ENet.py:22-32); test fixtures may
        supply slim graphs."""
        kw = {}
        try:
            dec = enet_vars["params"]["low_res"]["decoder"]
            outer = next(v for k, v in dec.items() if k.startswith("res"))
            kw["lnet_res_blocks"] = sum(1 for k in outer if k.startswith("res"))
        except (KeyError, StopIteration, TypeError, AttributeError):
            pass
        try:
            p = enet_vars["params"]
            se = p["style_encoder"]
            kw["num_style_feat"] = int(se["final_linear"]["weight"].shape[-1])
            narrow = int(se["final_conv"]["weight"].shape[-1]) / 512.0
            ch128 = int(se["conv_body_first"]["weight"].shape[-1])
            kw["narrow"] = narrow
            kw["channel_multiplier"] = ch128 / (128.0 * narrow)
            enc = p["low_res"]["encoder"]
            kw["lnet_base_nc"] = int(enc["first_inp"]["conv"]["weight"].shape[-1])
            kw["lnet_max_nc"] = max(int(v["conv"]["weight"].shape[-1])
                                    for k, v in enc.items()
                                    if k.startswith("inp_down"))
        except (KeyError, TypeError, AttributeError, ValueError):
            pass
        return ENet(**kw)

    def _enet_fn(self):
        if "enet" not in self._jits:
            model = self._enet_arch(self.models.enet)
            dt = self._dt

            @jax.jit
            def run(variables, mel, face, ref):
                pred, low = model.apply(
                    variables, mel.astype(dt), face.astype(dt), ref.astype(dt)
                )
                return jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)

            self._jits["enet"] = run
        return self._jits["enet"]

    def build_reference_faces(self, stabilized: np.ndarray,
                              full_frames, coordinates,
                              boxes: np.ndarray,
                              lms: Optional[np.ndarray] = None) -> jnp.ndarray:
        """datagen's reference construction (inference.py:341-367):
        re-align each stabilized 256^2 face, paste into the full frame via
        the inverse perspective transform, then cut the detector box.

        TPU-first: the host only solves the per-frame quad/homography (8
        floats each); grid construction, the QUAD warp, perspective paste,
        full-frame composite and box crop run as ONE device program over the
        whole clip. ``full_frames`` may be a device-resident uint8 array —
        the clip then never re-crosses the host link, and the returned refs
        stay on device for Step 6.

        Returns [N, img_size, img_size, 3] float32 device array (0..255).
        """
        from s2v_tpu.ops.warp import (
            affine_warp, affine_warp_shear, crop_resize_boxes,
        )

        n = len(stabilized)
        oy1, oy2, ox1, ox2 = [int(v) for v in coordinates]
        if lms is None:
            lms = self.extract_landmarks(stabilized)
        image_size = 256
        img_size = self.cfg.model.img_size

        # Per-frame geometry on host. quad_from_cxy quads are parallelograms
        # by construction (c +- x +- y), so BOTH warps — the QUAD re-align
        # (PIL bilinear-over-corners) and its inverse PERSPECTIVE paste
        # (calc_alignment_coefficients would solve g=h=0) — are exactly
        # affine: 6 floats per frame each, and the warps ride the
        # affine_warp path (separable sheared passes under model.approx_warp
        # instead of the descriptor-rate-bound 2x2-patch gather, profiled
        # at 0.4 TFLOP/s effective in tools/out/r5_allknobs3 reffaces).
        S = float(image_size)
        quad_mats = np.zeros((n, 2, 3), np.float32)   # crops <- stabilized
        paste_mats = np.zeros((n, 2, 3), np.float32)  # region256 <- crops
        for i in range(n):
            c, x, y = compute_transform(lms[i].astype(np.float64), scale=1.0)
            quad = quad_from_cxy(c, x, y)
            crop_box, quad_adj = crop_quad_params(
                quad, (image_size, image_size), image_size
            )
            # QUAD warp sampled from the FULL stabilized frame (crop offset
            # folded into the quad)
            q = quad_adj + np.asarray(crop_box[:2], np.float64)
            nw, sw, se, ne = q[0], q[1], q[2], q[3]
            ex, ey = (ne - nw) / S, (sw - nw) / S  # source steps per out px
            # index(x_out, y_out) = nw + (x+0.5)ex + (y+0.5)ey - 0.5
            quad_mats[i, 0] = [ex[0], ey[0],
                               nw[0] + 0.5 * (ex[0] + ey[0]) - 0.5]
            quad_mats[i, 1] = [ex[1], ey[1],
                               nw[1] + 0.5 * (ex[1] + ey[1]) - 0.5]
            # paste: output (x,y) in stabilized space -> source in crops:
            # F(u) = nw + M u with M = [ex ey]; source = M^-1((x,y)+0.5-nw)-0.5
            m = np.array([[ex[0], ey[0]], [ex[1], ey[1]]], np.float64)
            mi = np.linalg.inv(m)
            t = mi @ (np.array([0.5, 0.5]) - nw) - 0.5
            paste_mats[i, 0] = [mi[0, 0], mi[0, 1], t[0]]
            paste_mats[i, 1] = [mi[1, 0], mi[1, 1], t[1]]

        approx = bool(getattr(self.cfg.model, "approx_warp", False))
        key = ("ref_all", oy1, oy2, ox1, ox2, approx)
        if key not in self._jits:
            warp = affine_warp_shear if approx else affine_warp

            @jax.jit
            def ref_all(stab_u8, full_u8, qmats, pmats, boxes):
                stab = stab_u8.astype(jnp.float32)
                crops = warp(stab, qmats, (image_size, image_size),
                             inverse=True)  # [N,256,256,3]
                ff = full_u8.astype(jnp.float32)
                region = ff[:, oy1:oy2, ox1:ox2]
                region_256 = resize_bilinear(region, (256, 256))
                # RGB + coverage mask share one 4-channel paste warp
                packed = warp(
                    jnp.concatenate(
                        [crops, jnp.ones(crops.shape[:3] + (1,),
                                         jnp.float32)], axis=-1),
                    pmats, (image_size, image_size), inverse=True)
                projected, mask = packed[..., :3], packed[..., 3:4]
                pasted = projected * mask + region_256 * (1 - mask)
                back = jnp.clip(
                    resize_bilinear(pasted, region.shape[1:3]), 0, 255)
                ff = ff.at[:, oy1:oy2, ox1:ox2].set(back)
                return jnp.clip(
                    crop_resize_boxes(ff, boxes, (img_size, img_size)), 0, 255)

            self._jits[key] = ref_all

        return self._jits[key](
            self._dev(stabilized), self._dev(full_frames),
            self._dev(quad_mats), self._dev(paste_mats),
            self._dev(np.asarray(boxes)[:, [0, 1, 2, 3]].astype(np.float32)),
        )

    def synthesize(
        self,
        stabilized: np.ndarray,       # Step-5-enhanced 256^2 frames
        mel: jnp.ndarray,             # [80, T]
        full_frames: np.ndarray,      # original frames
        coordinates,                  # (oy1, oy2, ox1, ox2)
        fps: float,
        static: bool = False,
        boxes_full: Optional[np.ndarray] = None,  # Step-1 S3FD boxes (reuse)
        lms_full: Optional[np.ndarray] = None,    # Step-1 FAN landmarks
        lms_stab: Optional[np.ndarray] = None,    # landmarks of `stabilized`
    ) -> np.ndarray:
        """Step 6 (inference.py:259-330, restoration hooks optional).

        Under config ``model.reuse_detections`` the caller threads the
        Step-1 landmark sweep results through: ``lms_full`` replaces the
        RetinaFace passes inside the mouth-restorer / final-enhancer hooks
        (models/fan.py lm68_to_lm5) and ``lms_stab`` replaces
        build_reference_faces' own sweep."""
        self._require("enet")
        cfg = self.cfg
        img_size = cfg.model.img_size
        n_chunks = num_mel_chunks(mel.shape[1], fps)
        n_frames = min(len(stabilized), n_chunks)
        stabilized = stabilized[:n_frames]
        if isinstance(full_frames, jnp.ndarray):
            full_frames_t = full_frames[:n_frames]  # device slice
        else:
            full_frames_t = np.ascontiguousarray(full_frames[:n_frames])
        chunks = np.asarray(mel_chunks_for_frames(mel, n_chunks, fps))

        if cfg.infer.box[0] != -1:
            # fixed box bypasses detection, pads, and smoothing
            # (inference.py --box, wav2lip convention: top bottom left right)
            by1, by2, bx1, bx2 = cfg.infer.box
            fh, fw = full_frames_t.shape[1:3]
            boxes = np.tile(np.asarray(
                [max(bx1, 0), max(by1, 0), min(bx2, fw), min(by2, fh)],
                np.int32), (n_frames, 1))
        else:
            if boxes_full is None:
                # no Step-1 boxes supplied (precomputed-landmark paths) —
                # the reference re-detects here (inference.py:379 datagen)
                boxes_full = self.detect_boxes(full_frames_t)
            boxes = np.asarray(
                pad_and_smooth_boxes(
                    jnp.asarray(boxes_full[:n_frames]),
                    full_frames_t.shape[1:3],
                    pads=cfg.infer.pads, smooth=not cfg.infer.nosmooth,
                )
            ).astype(np.int32)

        # the clip crosses the host->device link ONCE as uint8; every Step-6
        # program indexes the device-resident copy
        full_dev = self._dev(full_frames_t)
        refs = self.build_reference_faces(
            stabilized, full_dev, coordinates, boxes, lms=lms_stab
        )  # device-resident [N, img, img, 3] f32

        # 5-point landmarks for the restoration hooks' detector-reuse path
        reuse = (getattr(self.cfg.model, "reuse_detections", False)
                 and lms_full is not None)
        if reuse:
            from s2v_tpu.models.fan import lm68_to_lm5

            lm5_full = np.asarray(lm68_to_lm5(
                np.asarray(lms_full)[:n_frames]), np.float32)

        # frame index for each mel chunk: ping-pong past the end
        # (inference.py:369-377 mirrors once; generalized to a periodic
        # reflection so clips much shorter than the audio stay valid)
        def frame_index(i):
            if static or n_frames == 1:
                return 0
            period = 2 * n_frames - 2
            j = i % period
            return j if j < n_frames else period - j

        run = self._enet_fn()
        batch = cfg.infer.lnet_batch_size

        from s2v_tpu.ops.warp import crop_resize_boxes, paste_resize_boxes

        if "prep" not in self._jits:
            @jax.jit
            def prep(frames_b, boxes_b, refs_b):
                # batched box crops + lower-half mask + concat as one device
                # program (inference.py:383-399 datagen equivalent)
                ofaces = crop_resize_boxes(
                    frames_b.astype(jnp.float32), boxes_b,
                    (img_size, img_size)) / 255.0
                masked = ofaces.at[:, img_size // 2 :].set(0.0)
                ref_b = refs_b / 255.0
                return ofaces, jnp.concatenate([masked, ref_b], axis=-1), ref_b

            self._jits["prep"] = prep
            # the batched resize + paste-back (the reference's per-frame
            # cv2.resize + slice assignment, inference.py:316-330); uint8
            # output so the composited frames cross the link at 1 byte/px
            self._jits["paste"] = jax.jit(
                lambda fr, pr, bx: jnp.clip(
                    paste_resize_boxes(fr.astype(jnp.float32), pr, bx),
                    0, 255).astype(jnp.uint8))
            # crop + mask + ENet + paste as ONE program per batch: on a
            # relayed TPU every synchronized call costs ~0.1-1 s of link
            # latency, so the default (non-without_rl1) path is one dispatch
            enet_run = self._enet_fn()
            paste_fn = self._jits["paste"]
            prep_fn = prep

            @jax.jit
            def step6_full(variables, frames_b, boxes_b, refs_b, mel_b):
                ofaces, face, ref_b = prep_fn(frames_b, boxes_b, refs_b)
                pred = enet_run(variables, mel_b, face, ref_b)
                return paste_fn(frames_b, pred * 255.0, boxes_b)

            self._jits["step6_full"] = step6_full
        prep = self._jits["prep"]

        boxes_dev = self._dev(boxes.astype(np.float32))

        def assemble(start):
            idxs = [frame_index(i)
                    for i in range(start, min(start + batch, n_chunks))]
            padded = jnp.asarray(idxs + [idxs[-1]] * (batch - len(idxs)))
            mel_b = self._dev(chunks[np.asarray(padded)][..., None])
            if not cfg.infer.without_rl1:
                pasted_dev = self._jits["step6_full"](
                    self.models.enet, self._dev(full_dev[padded]),
                    self._dev(boxes_dev[padded]), self._dev(refs[padded]),
                    mel_b)
                return idxs, None, None, None, pasted_dev
            # without_rl1 needs the intermediate faces on host for the
            # masked composite — drain re-pastes after compositing, so no
            # paste is dispatched here
            ofaces, face, ref_batch = prep(
                full_dev[padded], boxes_dev[padded], refs[padded],
            )
            pred = run(self.models.enet, mel_b, face, ref_batch)
            return idxs, face, ofaces, pred, None

        def drain(idxs, face_np, orig, pred, pasted_dev):
            # upper-face edit + masked composite (inference.py:269-286):
            # GANimation only takes effect through the --without_rl1 path
            if cfg.infer.without_rl1:
                pred = np.asarray(pred)
                face_np = np.asarray(face_np)
                orig = np.asarray(orig)
                if self.models.up_face_editor is not None:
                    cur = self.models.up_face_editor(orig)
                else:
                    cur = orig
                mask = (face_np[..., :3] == 0).astype(np.float32)
                pred = pred * mask + cur * (1.0 - mask)
                bsel = boxes[idxs]
                pasted = np.asarray(self._jits["paste"](
                    jnp.asarray(full_frames_t[np.asarray(idxs)]),
                    jnp.asarray(pred)[: len(idxs)] * 255.0,
                    jnp.asarray(bsel.astype(np.float32)),
                ))
            else:
                bsel = boxes[idxs]
                if self.models.mouth_restorer is not None:
                    # keep the composited frames on device — the mouth tail
                    # chains GFPGAN/ParseNet/blend programs on them directly
                    pasted = pasted_dev[: len(idxs)]
                else:
                    pasted = np.asarray(pasted_dev)[: len(idxs)]  # u8 D2H

            # batched restoration tail: GFPGAN mouth restore + Laplacian
            # blend (inference.py:299-312), then GPEN-2048 + RealESRNet x2
            # full-frame enhancement (inference.py:317-330) — both hooks
            # take the whole [B] chunk; no per-frame device calls remain.
            if self.models.mouth_restorer is not None:
                if reuse:
                    pasted = self.models.mouth_restorer(
                        pasted, bsel, landmarks5=lm5_full[np.asarray(idxs)])
                else:
                    pasted = self.models.mouth_restorer(pasted, bsel)
            if self.models.final_enhancer is not None:
                if reuse:
                    final = self.models.final_enhancer(
                        pasted, bsel, landmarks5=lm5_full[np.asarray(idxs)],
                        det_boxes=bsel)
                else:
                    final = self.models.final_enhancer(pasted, bsel)
                if cfg.infer.cropped_image:
                    # --cropped_image (inference.py:316-325): downscale the
                    # enhanced frame back to 1x and paste only the face box
                    # into the untouched original frame
                    if "crop_down" not in self._jits:
                        hw = pasted.shape[1:3]
                        self._jits["crop_down"] = jax.jit(
                            lambda x: resize_bilinear(x, hw))
                    pp = np.asarray(self._jits["crop_down"](
                        jnp.asarray(final.astype(np.float32))))
                    ff = np.asarray(
                        full_frames_t[np.asarray(idxs)]).astype(
                        np.float32).copy()
                    for k in range(len(idxs)):
                        x1, y1, x2, y2 = bsel[k]
                        ff[k, y1:y2, x1:x2] = pp[k, y1:y2, x1:x2]
                    return list(np.clip(ff, 0, 255).astype(np.uint8))
                return list(np.asarray(final).astype(np.uint8))
            return list(np.clip(pasted, 0, 255).astype(np.uint8))

        # double-buffered: keep up to `inflight` device batches queued so
        # Step-6 compute overlaps the host-side paste-back (the reference
        # serializes them; SURVEY §7 step 8)
        from collections import deque

        inflight = 2
        queue: deque = deque()
        out_frames = []
        for start in range(0, n_chunks, batch):
            queue.append(assemble(start))
            if len(queue) > inflight:
                out_frames.extend(drain(*queue.popleft()))
        while queue:
            out_frames.extend(drain(*queue.popleft()))
        return np.stack(out_frames)

    # ------------------------------------------------------------------
    # Full run
    # ------------------------------------------------------------------

    def run(self, face_path: str, audio_path: str, outfile: str) -> str:
        cfg = self.cfg
        reader = VideoReader(face_path)
        frames = reader.read_all()
        fps = reader.fps or cfg.infer.fps
        cy1, cy2, cx1, cx2 = cfg.infer.crop  # --crop: top bottom left right
        if (cy1, cy2, cx1, cx2) != (0, -1, 0, -1):
            cy2 = frames.shape[1] if cy2 == -1 else cy2
            cx2 = frames.shape[2] if cx2 == -1 else cx2
            frames = frames[:, cy1:cy2, cx1:cx2]

        # per-video artifact cache for Steps 1-3 and 5 (the reference's
        # temp/<base>_{landmarks.txt,coeffs.npy,stablized.npy,enhanced5.npy}
        # files, facing.py:89-198) — a second run of the same clip skips
        # straight to Step 6; --re_preprocess recomputes.
        from s2v_tpu.utils.cache import ArtifactCache

        base = os.path.splitext(os.path.basename(face_path))[0]
        cache = ArtifactCache(cfg.infer.tmp_dir)
        refresh = cfg.infer.re_preprocess
        # a single pipeline version shared by EVERY stage key: bumping it
        # invalidates the whole chain at once, so fresh Step-1 outputs can
        # never be mixed with stale downstream artifacts
        crop_p = {"crop": cfg.infer.crop, "v": _CACHE_VERSION}

        # the clip crosses the host->device link ONCE; every stage program
        # chains on device-resident intermediates (device slices instead of
        # per-stage re-uploads); the host only sees cache artifacts, PIL
        # alignment inputs and the final frames
        frames_dev = self._dev(frames)
        dev: Dict[str, jnp.ndarray] = {}

        step_lm = cache.get_or_compute(
            base, "landmarks",
            lambda: dict(zip(("lm", "boxes"), self.extract_landmarks(
                frames_dev, return_boxes=True))),
            params=crop_p, refresh=refresh,
        )
        lm, boxes_full = step_lm["lm"], step_lm["boxes"]

        def compute_ffhq():
            f256, coords = self.ffhq_crop(frames, lm[0],
                                          frames_dev=frames_dev,
                                          device_out=True)
            dev["f256"] = f256
            return {"frames": np.asarray(f256), "coords": coords}

        step1 = cache.get_or_compute(
            base, "ffhq", compute_ffhq, params=crop_p, refresh=refresh,
        )
        frames_256 = step1["frames"]
        f256_dev = dev.get("f256")
        if f256_dev is None:  # cache hit: re-upload once
            f256_dev = self._dev(frames_256)
        coordinates = tuple(int(v) for v in np.asarray(step1["coords"]))
        semantic = cache.get_or_compute(
            base, "coeffs",
            lambda: self.extract_coeffs(
                frames_256, self.extract_landmarks(f256_dev)),
            params=crop_p, refresh=refresh,
        )

        def compute_stab():
            # deferred cache write: the host copy starts asynchronously and
            # lands at cache.flush() after Step 6 — the d2h overlaps with
            # the downstream programs instead of stalling the chain here
            dev["stab"] = self.stabilize(f256_dev, semantic,
                                         one_shot=cfg.infer.one_shot,
                                         device_out=True)
            return dev["stab"]

        stabilized = cache.get_or_compute(
            base, "stabilized", compute_stab,
            params={**crop_p, "one_shot": cfg.infer.one_shot,
                    "exp_img": cfg.infer.exp_img},
            refresh=refresh, defer=True,
        )
        stab_dev = dev.get("stab")
        if stab_dev is None:
            stab_dev = self._dev(stabilized)
        reuse = getattr(self.cfg.model, "reuse_detections", False)
        lm_stab_holder: Dict[str, np.ndarray] = {}
        if self.models.ref_enhancer is not None:
            # Step 5 (inference.py:234-238), batched over the whole clip;
            # the hook may return a device array (cli wires device_out)
            def compute_enh():
                kw = {}
                if reuse:
                    # one FAN sweep serves the Step-5 enhancer (whose own
                    # RetinaFace pass is then dropped) AND the reference-
                    # face sweep in Step 6 (config model.reuse_detections)
                    from s2v_tpu.models.fan import lm68_to_lm5

                    lm_s, bx_s = self.extract_landmarks(
                        stab_dev, return_boxes=True)
                    lm_stab_holder["lm"] = lm_s
                    kw = {"landmarks5": np.asarray(
                        lm68_to_lm5(lm_s), np.float32),
                        "det_boxes": bx_s}
                e = self.models.ref_enhancer(stab_dev, **kw)
                if isinstance(e, jnp.ndarray):
                    dev["enh"] = e
                    return e  # deferred cache write (see compute_stab)
                return np.asarray(e)

            stabilized = cache.get_or_compute(
                base, "enhanced5", compute_enh,
                params={**crop_p, "reuse_det": reuse}, refresh=refresh,
                defer=True,
            )
            stab_dev = dev.get("enh")
            if stab_dev is None:
                stab_dev = self._dev(stabilized)

        wav = load_wav(audio_path, cfg.audio.sample_rate)
        mel = melspectrogram(jnp.asarray(wav), cfg.audio)
        if not bool(jnp.isfinite(mel).all()):
            raise ValueError(
                "Mel contains nan! Using a TTS voice? Add a small epsilon "
                "noise to the wav file and try again"
            )

        try:
            out = self.synthesize(stab_dev, mel, frames_dev, coordinates,
                                  fps, static=cfg.infer.static,
                                  boxes_full=boxes_full,
                                  lms_full=lm if reuse else None,
                                  lms_stab=lm_stab_holder.get("lm"))
        finally:
            # materialize the deferred Step-3/5 cache writes (their async
            # d2h copies overlapped with Step 6; a Step-6 crash must not
            # lose the finished upstream artifacts either)
            cache.flush()

        tmp_video = os.path.join(cfg.infer.tmp_dir, "result.npz")
        os.makedirs(cfg.infer.tmp_dir, exist_ok=True)
        writer = VideoWriter(tmp_video, fps, out.shape[1:3])
        for f in out:
            writer.write(f)
        writer.close()
        return mux_audio(writer.path, audio_path, outfile)
