"""S3FD single-shot face detector (reference:
third_part/face_detection/detection/sfd/net_s3fd.py + detect.py + bbox.py).

TPU-first redesign of the detection path:

- The VGG backbone + 6 detection heads run as one batched NHWC forward.
- The reference decodes anchors in a *host-side python loop* over
  ``np.where(score > 0.05)`` hits (detect.py:77-92). Here the decode is a
  closed-form array op over every anchor of every scale at once: priors are
  static per (input-size, scale), so XLA folds them, and the whole
  detect-for-batch is one jit program — no host round-trip per frame.
- The pipeline only consumes the best box per frame (api.py:64-77 takes
  ``d[0]`` after score-ordered NMS, i.e. the global argmax). ``best_boxes``
  therefore skips NMS entirely. A fixed-size jax NMS is provided for the
  multi-face API (``detect_from_batch`` parity).

Weight conversion: torch state_dict from the reference's s3fd checkpoint maps
by layer name (convN_M -> same names here).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from s2v_tpu.models.layers import Conv

# BGR means subtracted by the reference before detection (detect.py:59)
BGR_MEAN = (104.0, 117.0, 123.0)


class L2Norm(nn.Module):
    """net_s3fd.py:6-20."""

    channels: int
    scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        weight = self.param(
            "weight", lambda k, s: jnp.full(s, self.scale), (self.channels,)
        )
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)) + 1e-10
        return x / norm * weight.astype(x.dtype)


def _max_pool(x):
    return nn.max_pool(x, (2, 2), (2, 2))


class S3FD(nn.Module):
    """net_s3fd.py:22-140 in NHWC. Input: [B, H, W, 3] BGR, mean-subtracted.

    Returns 6 (cls, reg) pairs; cls1 has background max-out applied
    (net_s3fd.py:124-127), all cls maps are post-softmax probabilities
    (the reference applies softmax in detect.py:72-74).
    """

    @nn.compact
    def __call__(self, x) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
        relu = jax.nn.relu

        def conv(name, feats, k=3, s=1, p=1):
            return Conv(feats, (k, k), (s, s), (p, p), name=name)

        h = relu(conv("conv1_1", 64)(x))
        h = relu(conv("conv1_2", 64)(h))
        h = _max_pool(h)
        h = relu(conv("conv2_1", 128)(h))
        h = relu(conv("conv2_2", 128)(h))
        h = _max_pool(h)
        h = relu(conv("conv3_1", 256)(h))
        h = relu(conv("conv3_2", 256)(h))
        h = relu(conv("conv3_3", 256)(h))
        f3_3 = h
        h = _max_pool(h)
        h = relu(conv("conv4_1", 512)(h))
        h = relu(conv("conv4_2", 512)(h))
        h = relu(conv("conv4_3", 512)(h))
        f4_3 = h
        h = _max_pool(h)
        h = relu(conv("conv5_1", 512)(h))
        h = relu(conv("conv5_2", 512)(h))
        h = relu(conv("conv5_3", 512)(h))
        f5_3 = h
        h = _max_pool(h)
        h = relu(conv("fc6", 1024, k=3, p=3)(h))
        h = relu(conv("fc7", 1024, k=1, p=0)(h))
        ffc7 = h
        h = relu(conv("conv6_1", 256, k=1, p=0)(h))
        h = relu(conv("conv6_2", 512, k=3, s=2, p=1)(h))
        f6_2 = h
        h = relu(conv("conv7_1", 128, k=1, p=0)(h))
        h = relu(conv("conv7_2", 256, k=3, s=2, p=1)(h))
        f7_2 = h

        f3_3 = L2Norm(256, 10.0, name="conv3_3_norm")(f3_3)
        f4_3 = L2Norm(512, 8.0, name="conv4_3_norm")(f4_3)
        f5_3 = L2Norm(512, 5.0, name="conv5_3_norm")(f5_3)

        cls1 = conv("conv3_3_norm_mbox_conf", 4)(f3_3)
        reg1 = conv("conv3_3_norm_mbox_loc", 4)(f3_3)
        cls2 = conv("conv4_3_norm_mbox_conf", 2)(f4_3)
        reg2 = conv("conv4_3_norm_mbox_loc", 4)(f4_3)
        cls3 = conv("conv5_3_norm_mbox_conf", 2)(f5_3)
        reg3 = conv("conv5_3_norm_mbox_loc", 4)(f5_3)
        cls4 = conv("fc7_mbox_conf", 2)(ffc7)
        reg4 = conv("fc7_mbox_loc", 4)(ffc7)
        cls5 = conv("conv6_2_mbox_conf", 2)(f6_2)
        reg5 = conv("conv6_2_mbox_loc", 4)(f6_2)
        cls6 = conv("conv7_2_mbox_conf", 2)(f7_2)
        reg6 = conv("conv7_2_mbox_loc", 4)(f7_2)

        # max-out background label on the stride-4 map (net_s3fd.py:124-127)
        bmax = jnp.maximum(
            jnp.maximum(cls1[..., 0:1], cls1[..., 1:2]), cls1[..., 2:3]
        )
        cls1 = jnp.concatenate([bmax, cls1[..., 3:4]], axis=-1)

        outs = []
        for cls, reg in [(cls1, reg1), (cls2, reg2), (cls3, reg3),
                         (cls4, reg4), (cls5, reg5), (cls6, reg6)]:
            outs.append((jax.nn.softmax(cls, axis=-1), reg))
        return outs


@functools.lru_cache(maxsize=None)
def _priors(fh: int, fw: int, stride: int) -> np.ndarray:
    """[fh*fw, 4] (cx, cy, s, s) anchors (detect.py:82-86)."""
    ys, xs = np.mgrid[0:fh, 0:fw].astype(np.float32)
    cx = stride / 2.0 + xs * stride
    cy = stride / 2.0 + ys * stride
    size = np.full_like(cx, stride * 4.0)
    return np.stack([cx, cy, size, size], axis=-1).reshape(-1, 4)


def decode_all(outs) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All-scale vectorized anchor decode (bbox.py:91-108 semantics).

    outs: list of 6 (cls [B,fh,fw,2], reg [B,fh,fw,4]).
    Returns (boxes [B, N, 4] in x1y1x2y2, scores [B, N]).
    """
    v0, v1 = 0.1, 0.2
    boxes_all, scores_all = [], []
    for i, (cls, reg) in enumerate(outs):
        stride = 2 ** (i + 2)
        b, fh, fw, _ = cls.shape
        pri = jnp.asarray(_priors(fh, fw, stride))[None]  # [1, N, 4]
        loc = reg.reshape(b, fh * fw, 4)
        cxcy = pri[..., :2] + loc[..., :2] * v0 * pri[..., 2:]
        wh = pri[..., 2:] * jnp.exp(loc[..., 2:] * v1)
        x1y1 = cxcy - wh / 2.0
        x2y2 = x1y1 + wh
        boxes_all.append(jnp.concatenate([x1y1, x2y2], axis=-1))
        scores_all.append(cls[..., 1].reshape(b, fh * fw))
    return jnp.concatenate(boxes_all, axis=1), jnp.concatenate(scores_all, axis=1)


def best_boxes(outs, score_thresh: float = 0.5):
    """Highest-scoring face per image (the pipeline's d[0], api.py:64-77).

    Returns (boxes [B, 4] float x1y1x2y2 clipped >= 0, valid [B] bool).
    """
    boxes, scores = decode_all(outs)
    idx = jnp.argmax(scores, axis=1)
    best = jnp.take_along_axis(boxes, idx[:, None, None], axis=1)[:, 0]
    best_score = jnp.take_along_axis(scores, idx[:, None], axis=1)[:, 0]
    return jnp.maximum(best, 0.0), best_score > score_thresh


def nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray, top_k: int = 32,
              iou_thresh: float = 0.3, score_thresh: float = 0.5):
    """Fixed-size jax NMS over the top_k candidates (bbox.py:44-66 semantics,
    including the +1 in the area/overlap computation).

    boxes: [N, 4]; scores: [N]. Returns (boxes [top_k,4], scores [top_k],
    keep_mask [top_k]) ordered by score.
    """
    k = min(top_k, scores.shape[0])
    top_scores, order = jax.lax.top_k(scores, k)
    cand = boxes[order]  # [k, 4]

    x1, y1, x2, y2 = cand[:, 0], cand[:, 1], cand[:, 2], cand[:, 3]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    w = jnp.maximum(0.0, xx2 - xx1 + 1)
    h = jnp.maximum(0.0, yy2 - yy1 + 1)
    iou = w * h / (areas[:, None] + areas[None, :] - w * h)

    def body(i, keep):
        # suppress i if a kept higher-scoring j overlaps it
        sup = jnp.any((jnp.arange(k) < i) & keep & (iou[i] > iou_thresh))
        return keep.at[i].set(jnp.logical_not(sup) & keep[i])

    keep = jax.lax.fori_loop(0, k, body, jnp.ones((k,), bool))
    keep = keep & (top_scores > score_thresh)
    return cand, top_scores, keep


def pad_and_smooth_boxes(boxes: jnp.ndarray, image_hw: Tuple[int, int],
                         pads: Tuple[int, int, int, int] = (0, 20, 0, 0),
                         smooth: bool = True) -> jnp.ndarray:
    """face_detect post-processing (inference_utils.py:130-144): apply pads,
    clip to the frame, then 5-frame temporal smoothing. boxes [N, 4] x1y1x2y2
    -> [N, 4] int-truncated floats."""
    from s2v_tpu.parallel.halo import smooth_boxes

    h, w = image_hw
    pady1, pady2, padx1, padx2 = pads
    boxes = jnp.floor(boxes).astype(jnp.int32).astype(jnp.float32)
    x1 = jnp.maximum(boxes[:, 0] - padx1, 0)
    y1 = jnp.maximum(boxes[:, 1] - pady1, 0)
    x2 = jnp.minimum(boxes[:, 2] + padx2, w)
    y2 = jnp.minimum(boxes[:, 3] + pady2, h)
    out = jnp.stack([x1, y1, x2, y2], axis=1)
    if smooth:
        # the reference assigns float means back into an int array in place
        # (inference_utils.py:107), truncating each row — reproduce that
        out = smooth_boxes(out, 5, truncate=True)
    return out
