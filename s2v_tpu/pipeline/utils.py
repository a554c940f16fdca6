"""Pipeline array utilities (reference: futils/inference_utils.py).

All functions are batched jax/numpy ports of the reference's per-frame
OpenCV/host code, with the OpenCV conventions reproduced:

- ``pyr_down``/``pyr_up``: cv2.pyrDown/pyrUp — 5-tap Gaussian
  [1,4,6,4,1]/16 (outer product), REFLECT_101 borders, even-index
  decimation / zero-stuffed upsample with a 4x-scaled kernel.
- ``laplacian_pyramid_blend``: Laplacian_Pyramid_Blending_with_mask
  (inference_utils.py:181-222), the Step-6 mouth compositing.
- ``gaussian_blur`` / ``mask_postprocess``: cv2.GaussianBlur(101,101,sigma=11)
  twice with a zeroed border (inference_utils.py:59-64).
- semantic window/ratio helpers (inference_utils.py:73-99).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from s2v_tpu.parallel.halo import gather_windows

# ---------------------------------------------------------------------------
# 3DMM coefficient helpers
# ---------------------------------------------------------------------------


def split_coeff(coeffs: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[B, 257] ReconNet output -> named groups (inference_utils.py:158-179)."""
    return {
        "id": coeffs[:, :80],
        "exp": coeffs[:, 80:144],
        "tex": coeffs[:, 144:224],
        "angle": coeffs[:, 224:227],
        "gamma": coeffs[:, 227:254],
        "trans": coeffs[:, 254:],
    }


def transform_semantic(
    semantic: jnp.ndarray,
    crop_norm_ratio: Optional[jnp.ndarray] = None,
    window: int = 26,
) -> jnp.ndarray:
    """[N, 262] per-frame coeffs (+5 trans params) -> [N, 73, window].

    Batched equivalent of transform_semantic (inference_utils.py:78-91),
    producing the DNet driving input for every frame at once. Channel
    layout: exp(64) | angles(3) | translation(3) | crop(3).
    """
    windows = gather_windows(semantic, window)  # [N, window, 262]
    ex = windows[..., 80:144]
    angles = windows[..., 224:227]
    translation = windows[..., 254:257]
    crop = windows[..., 259:262]
    if crop_norm_ratio is not None:
        crop = jnp.concatenate(
            [crop[..., :1] * jnp.reshape(crop_norm_ratio, (-1, 1, 1)), crop[..., 1:]],
            axis=-1,
        )
    out = jnp.concatenate([ex, angles, translation, crop], axis=-1)  # [N,window,73]
    return jnp.transpose(out, (0, 2, 1))  # [N, 73, window]


def find_crop_norm_ratio(source_coeff: jnp.ndarray, target_coeffs: jnp.ndarray):
    """inference_utils.py:93-99: ratio of crop scales at the most similar
    (expression, pose) target frame."""
    alpha = 0.3
    exp_diff = jnp.mean(
        jnp.abs(target_coeffs[:, 80:144] - source_coeff[:, 80:144]), axis=1
    )
    angle_diff = jnp.mean(
        jnp.abs(target_coeffs[:, 224:227] - source_coeff[:, 224:227]), axis=1
    )
    index = jnp.argmin(alpha * exp_diff + (1 - alpha) * angle_diff)
    return source_coeff[:, -3] / target_coeffs[index, -3]


# ---------------------------------------------------------------------------
# OpenCV pyramid / blur equivalents
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _pyr_kernel1d() -> np.ndarray:
    return (np.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0).astype(np.float32)


def _depthwise5(x: jnp.ndarray, k1d: np.ndarray, gain: float = 1.0,
                stride: int = 1) -> jnp.ndarray:
    """Separable 5x5 depthwise filter (outer(k1d, k1d) * gain) with
    REFLECT_101 border on NHWC — two 5-tap passes instead of one 25-tap
    conv (same result up to f32 summation order; 2.5x less VPU work on the
    bandwidth-bound pyramid levels). ``stride=2`` fuses the pyrDown
    decimation into the passes (vertical pass drops odd rows before the
    horizontal pass runs — exact, decimation commutes with the other
    axis's conv)."""
    c = x.shape[-1]
    x = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    kv = jnp.asarray(k1d * gain, x.dtype)[:, None, None, None]
    kh = jnp.asarray(k1d, x.dtype)[None, :, None, None]
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(kv, (1, 1, 1, c)), (stride, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    return jax.lax.conv_general_dilated(
        x, jnp.tile(kh, (1, 1, 1, c)), (1, stride), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def pyr_down(x: jnp.ndarray) -> jnp.ndarray:
    """cv2.pyrDown on NHWC (blur then keep even rows/cols)."""
    return _depthwise5(x, _pyr_kernel1d(), stride=2)


def pyr_up(x: jnp.ndarray) -> jnp.ndarray:
    """cv2.pyrUp on NHWC (zero-stuff then blur with 4x kernel)."""
    b, h, w, c = x.shape
    z = jnp.zeros((b, h, 2, w, 2, c), x.dtype)
    z = z.at[:, :, 0, :, 0, :].set(x)
    z = z.reshape(b, 2 * h, 2 * w, c)
    return _depthwise5(z, _pyr_kernel1d(), gain=4.0)


def laplacian_pyramid_blend(
    a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray, num_levels: int = 10
) -> jnp.ndarray:
    """Blend a over b by mask through Laplacian pyramids, NHWC in [0,255].

    Port of Laplacian_Pyramid_Blending_with_mask (inference_utils.py:181-222)
    — used at 512^2 with 10 levels in Step 6 (inference.py:311-312). mask is
    [B, H, W] or [B, H, W, 1].
    """
    if mask.ndim == 3:
        mask = mask[..., None]
    gp_a, gp_b, gp_m = [a], [b], [mask]
    for _ in range(num_levels):
        gp_a.append(pyr_down(gp_a[-1]))
        gp_b.append(pyr_down(gp_b[-1]))
        gp_m.append(pyr_down(gp_m[-1]))

    # NOTE (reference quirk): the loop uses gp[num_levels-1] as the pyramid
    # base and iterates from num_levels-1 down to 1, so level num_levels is
    # computed but unused.
    lp_a = [gp_a[num_levels - 1]]
    lp_b = [gp_b[num_levels - 1]]
    gp_mr = [gp_m[num_levels - 1]]
    for i in range(num_levels - 1, 0, -1):
        lp_a.append(gp_a[i - 1] - pyr_up(gp_a[i]))
        lp_b.append(gp_b[i - 1] - pyr_up(gp_b[i]))
        gp_mr.append(gp_m[i - 1])

    ls = [la * gm + lb * (1.0 - gm) for la, lb, gm in zip(lp_a, lp_b, gp_mr)]
    out = ls[0]
    for i in range(1, num_levels):
        out = pyr_up(out) + ls[i]
    return out


@functools.lru_cache(maxsize=None)
def _gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel(ksize, sigma)."""
    n = np.arange(ksize) - (ksize - 1) / 2.0
    k = np.exp(-(n ** 2) / (2.0 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _blur_matrix(size: int, ksize: int, sigma: float) -> np.ndarray:
    """[size, size] banded Toeplitz matrix equal to the 1D Gaussian conv
    with REFLECT_101 border: (M @ v)[i] == GaussianBlur1d(v)[i]."""
    k = _gaussian_kernel1d(ksize, sigma)
    pad = ksize // 2
    m = np.zeros((size, size), np.float32)
    for t, kt in enumerate(k):
        for i in range(size):
            j = i + t - pad
            # reflect_101 fold of the out-of-range source index
            while j < 0 or j >= size:
                j = -j if j < 0 else 2 * (size - 1) - j
            m[i, j] += kt
    return m


def gaussian_blur(x: jnp.ndarray, ksize: int, sigma: float) -> jnp.ndarray:
    """cv2.GaussianBlur(ksize, sigma) with REFLECT_101 border, NHWC.

    TPU-first: the separable 1D passes run as banded-matrix matmuls on
    the MXU instead of depthwise convs — a [101,1] single-channel
    depthwise conv lowers to the VPU at ~0.1 TFLOP/s and dominated the
    enhancement stages (on-chip trace, tools/out/r5_xplane_*.json: 4x
    ~7.5 ms/batch in gpen512_step5 alone); the H^2*W matmul form costs
    more FLOPs but runs at MXU rate, >100x faster at 512^2.
    """
    b, h, w, c = x.shape
    mv = jnp.asarray(_blur_matrix(h, ksize, sigma), x.dtype)
    mh = jnp.asarray(_blur_matrix(w, ksize, sigma), x.dtype)
    # vertical pass over H, then horizontal over W (matches cv2's
    # separable evaluation; both borders are folded into the matrices)
    x = jnp.einsum("ih,bhwc->biwc", mv, x,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("jw,bhwc->bhjc", mh, x,
                      precision=jax.lax.Precision.HIGHEST)


def mask_postprocess(mask: jnp.ndarray, thres: int = 20) -> jnp.ndarray:
    """inference_utils.py:59-64: zero a border then double gaussian blur.

    mask: [B, H, W] or [B, H, W, 1] float.
    """
    squeeze = mask.ndim == 3
    if squeeze:
        mask = mask[..., None]
    b, h, w, _ = mask.shape
    m = jnp.zeros_like(mask)
    m = m.at[:, thres : h - thres, thres : w - thres, :].set(
        mask[:, thres : h - thres, thres : w - thres, :]
    )
    m = gaussian_blur(m, 101, 11.0)
    m = gaussian_blur(m, 101, 11.0)
    return m[..., 0] if squeeze else m


_CHUNKER_JITS: Dict = {}


def device_chunker(x, batch: int, pad_chunk=None):
    """Fixed-size chunk provider over the leading (frame) axis.

    Host input (numpy): upload one repeat-padded chunk per call (the
    classic path). DEVICE input (jnp array): pad once on device to a
    multiple of ``batch`` and serve chunks via ONE compiled dynamic-slice
    program — zero bytes cross the host link and each chunk is one tiny
    dispatch. This is what lets pipeline stages chain on device-resident
    intermediates instead of re-uploading the clip at every stage."""
    if not isinstance(x, jnp.ndarray):
        x = np.ascontiguousarray(x)

        def host_chunk(i):
            c = x[i : i + batch]
            pad = batch - len(c)
            if pad:
                c = np.concatenate([c, np.repeat(c[-1:], pad, 0)])
            return jnp.asarray(c)

        return host_chunk if pad_chunk is None else (
            lambda i: jnp.asarray(pad_chunk(x, i, batch)))
    n = x.shape[0]
    pad = (-n) % batch
    if pad:
        x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, 0)])
    key = (batch, x.shape[1:], str(x.dtype))
    if key not in _CHUNKER_JITS:
        _CHUNKER_JITS[key] = jax.jit(
            lambda a, i: jax.lax.dynamic_slice_in_dim(a, i, batch))
    slicer = _CHUNKER_JITS[key]
    return lambda i: slicer(x, i)
