"""Fine-tuning batch construction from pipeline artifacts (reference:
training.py:408-470 — batches come from the same datagen as inference,
pickled to temp/*_gen.npy and replayed per epoch).

Here the LipSyncPipeline produces the Step-0..5 artifacts (optionally
cached), and ``build_enet_batches`` assembles the (mel, face, ref, target)
training batches: the masked original face + re-aligned reference on
channels, ground truth = the original crop.
"""

from __future__ import annotations

from typing import Dict, Iterator, List

import numpy as np

import jax.numpy as jnp

from s2v_tpu.audio.melspec import mel_chunks_for_frames, num_mel_chunks
from s2v_tpu.models.s3fd import pad_and_smooth_boxes
from s2v_tpu.ops.image import resize_bilinear


def build_enet_batches(
    pipeline,                     # LipSyncPipeline
    stabilized: np.ndarray,       # Step-5-enhanced 256^2 frames
    mel,                          # [80, T]
    full_frames: np.ndarray,
    coordinates,
    fps: float,
    batch_size: int = 16,
    img_size: int = 384,
) -> List[Dict[str, np.ndarray]]:
    """training.py's datagen-equivalent batches for finetune_enet."""
    n_chunks = num_mel_chunks(mel.shape[1], fps)
    n = min(len(stabilized), n_chunks, len(full_frames))
    chunks = np.asarray(mel_chunks_for_frames(mel, n_chunks, fps))[:n]

    boxes = pipeline.detect_boxes(full_frames[:n])
    boxes = np.asarray(
        pad_and_smooth_boxes(jnp.asarray(boxes), full_frames.shape[1:3])
    ).astype(np.int32)
    refs = pipeline.build_reference_faces(
        stabilized[:n], full_frames[:n], coordinates, boxes
    )

    from s2v_tpu.ops.warp import crop_resize_boxes

    ofaces = np.asarray(
        crop_resize_boxes(
            jnp.asarray(full_frames[:n].astype(np.float32)), boxes[:n],
            (img_size, img_size),
        )
    ) / 255.0
    refs = np.asarray(refs)[:n] / 255.0
    masked = ofaces.copy()
    masked[:, img_size // 2:] = 0
    faces = np.concatenate([masked, refs], axis=-1)

    batches = []
    for s in range(0, n, batch_size):
        e = min(s + batch_size, n)
        batches.append({
            "mel": chunks[s:e][..., None],
            "face": faces[s:e],
            "ref": refs[s:e],
            "target": ofaces[s:e],
        })
    return batches
