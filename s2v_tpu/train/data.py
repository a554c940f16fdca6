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

    batches = []
    cur: Dict[str, List] = {"mel": [], "face": [], "ref": [], "target": []}
    for i in range(n):
        x1, y1, x2, y2 = boxes[i]
        oface = np.asarray(
            resize_bilinear(
                jnp.asarray(full_frames[i, y1:y2, x1:x2][None].astype(np.float32)),
                (img_size, img_size),
            )
        )[0] / 255.0
        ref = np.asarray(
            resize_bilinear(
                jnp.asarray(refs[i][None].astype(np.float32)),
                (img_size, img_size),
            )
        )[0] / 255.0
        masked = oface.copy()
        masked[img_size // 2:] = 0
        cur["mel"].append(chunks[i][..., None])
        cur["face"].append(np.concatenate([masked, ref], axis=-1))
        cur["ref"].append(ref)
        cur["target"].append(oface)
        if len(cur["mel"]) == batch_size:
            batches.append({k: np.stack(v) for k, v in cur.items()})
            cur = {k: [] for k in cur}
    if cur["mel"]:
        batches.append({k: np.stack(v) for k, v in cur.items()})
    return batches
