"""3DMM preprocessing math (reference: third_part/face3d/util/preprocess.py).

POS similarity solve, 5-point extraction, align_img, and the umeyama
similarity estimate (the skimage SimilarityTransform the reference uses in
estimate_norm and GPEN's align_faces). The geometric solves are numpy
(a handful of floats per frame); the image resample runs through PIL on the
host for exact reference parity (the 3DMM stage is not a pipeline hot spot
— the regressor forward is, and that is batched on device).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def POS(xp: np.ndarray, x: np.ndarray) -> Tuple[np.ndarray, float]:
    """Least-squares 3D->2D similarity (preprocess.py:18-40).

    xp: [2, N] image points; x: [3, N] canonical 3D points.
    Returns (t [2,1], s scalar).
    """
    npts = xp.shape[1]
    a = np.zeros([2 * npts, 8])
    a[0 : 2 * npts - 1 : 2, 0:3] = x.T
    a[0 : 2 * npts - 1 : 2, 3] = 1
    a[1 : 2 * npts : 2, 4:7] = x.T
    a[1 : 2 * npts : 2, 7] = 1
    b = np.reshape(xp.T, [2 * npts, 1])
    k, _, _, _ = np.linalg.lstsq(a, b, rcond=None)
    r1, r2 = k[0:3], k[4:7]
    s = (np.linalg.norm(r1) + np.linalg.norm(r2)) / 2
    t = np.array([float(k[3][0]), float(k[7][0])])
    return t, float(s)


def extract_5p(lm: np.ndarray) -> np.ndarray:
    """68 -> 5 landmarks (preprocess.py:161-166)."""
    lm_idx = np.array([31, 37, 40, 43, 46, 49, 55]) - 1
    lm5p = np.stack(
        [
            lm[lm_idx[0]],
            np.mean(lm[lm_idx[[1, 2]]], 0),
            np.mean(lm[lm_idx[[3, 4]]], 0),
            lm[lm_idx[5]],
            lm[lm_idx[6]],
        ],
        axis=0,
    )
    return lm5p[[1, 2, 0, 3, 4]]


def align_img(
    img,  # PIL.Image
    lm: np.ndarray,
    lm3d: np.ndarray,
    target_size: float = 224.0,
    rescale_factor: float = 102.0,
):
    """preprocess.py:169-190: POS solve -> bicubic resize -> center crop.

    Returns (trans_params [w0,h0,s,tx,ty], img_new PIL 224^2, lm_new).
    """
    from PIL import Image

    w0, h0 = img.size
    lm5p = extract_5p(lm) if lm.shape[0] != 5 else lm
    t, s = POS(lm5p.T, lm3d.T)
    s = rescale_factor / s

    w = (w0 * s).astype(np.int32) if isinstance(s, np.ndarray) else int(w0 * s)
    h = int(h0 * s)
    left = int(w / 2 - target_size / 2 + (t[0] - w0 / 2) * s)
    right = left + int(target_size)
    up = int(h / 2 - target_size / 2 + (h0 / 2 - t[1]) * s)
    below = up + int(target_size)

    img_new = img.resize((w, h), resample=Image.BICUBIC).crop((left, up, right, below))
    lm_new = np.stack(
        [lm[:, 0] - t[0] + w0 / 2, lm[:, 1] - t[1] + h0 / 2], axis=1
    ) * s
    lm_new = lm_new - np.array([[w / 2 - target_size / 2, h / 2 - target_size / 2]])

    trans_params = np.array([w0, h0, s, t[0], t[1]], dtype=np.float32)
    return trans_params, img_new, lm_new


def umeyama(src: np.ndarray, dst: np.ndarray, estimate_scale: bool = True) -> np.ndarray:
    """Least-squares similarity transform (Umeyama 1991) — skimage
    SimilarityTransform.estimate / GPEN align_faces.py:25 equivalent.

    src, dst: [N, 2]. Returns 3x3 homogeneous matrix mapping src -> dst.
    """
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
    if rank == 0:
        return t * np.nan
    elif rank == dim - 1:
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
        scale = 1.0 / src_d.var(axis=0).sum() * (s @ d)
    else:
        scale = 1.0
    t[:dim, dim] = dst_mean - scale * (t[:dim, :dim] @ src_mean)
    t[:dim, :dim] *= scale
    return t


# insightface 112x112 template (preprocess.py:196-227 estimate_norm)
ARCFACE_DST = np.array(
    [[38.2946, 51.6963], [73.5318, 51.5014], [56.0252, 71.7366],
     [41.5493, 92.3655], [70.7299, 92.2041]],
    dtype=np.float32,
)


def estimate_norm(lm_68p: np.ndarray, height: float) -> np.ndarray:
    """preprocess.py:196-227: 5-point similarity to the arcface template
    (y flipped to image coords). Returns [2, 3] affine."""
    lm = extract_5p(lm_68p).copy()
    lm[:, -1] = height - 1 - lm[:, -1]
    m = umeyama(lm, ARCFACE_DST, True)
    if not np.isfinite(m).all() or np.linalg.det(m) == 0:
        m = np.eye(3)
    return m[0:2]


def load_lm3d(bfm_dir: str) -> np.ndarray:
    """Standard 5-point 3D landmarks (util/load_mats.py:105-117): loads
    similarity_Lm3D_all.mat, picks the 5-point subset, recenters.

    The BFM data files ship separately (like the reference's checkpoints/BFM).
    """
    import os
    from scipy.io import loadmat

    path = os.path.join(bfm_dir, "similarity_Lm3D_all.mat")
    if not os.path.isfile(path):
        raise FileNotFoundError(
            f"BFM landmark file not found: {path}. Download the Basel Face "
            "Model data as in the reference README and point --checkpoint_dir "
            "at it."
        )
    lm3d = loadmat(path)["lm"]
    lm_idx = np.array([31, 37, 40, 43, 46, 49, 55]) - 1
    lm3d = np.stack(
        [
            lm3d[lm_idx[0]],
            np.mean(lm3d[lm_idx[[1, 2]]], 0),
            np.mean(lm3d[lm_idx[[3, 4]]], 0),
            lm3d[lm_idx[5]],
            lm3d[lm_idx[6]],
        ],
        axis=0,
    )
    return lm3d[[1, 2, 0, 3, 4], :]
