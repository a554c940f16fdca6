"""Training-data degradation pipeline (reference:
third_part/GPEN/training/data_loader/degradations.py and GFPGAN's
FFHQDegradationDataset flow: random anisotropic gaussian blur ->
random downsample -> gaussian noise -> JPEG compression -> upsample back).

Kernel synthesis is the reference's numpy math; JPEG uses PIL (the
reference uses cv2.imencode). Everything is seeded through numpy Generators
for reproducible data pipelines.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def sigma_matrix2(sig_x: float, sig_y: float, theta: float) -> np.ndarray:
    """degradations.py:16-29."""
    d = np.array([[sig_x ** 2, 0], [0, sig_y ** 2]])
    u = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    return u @ d @ u.T


def mesh_grid(kernel_size: int):
    """degradations.py:32-47."""
    ax = np.arange(-kernel_size // 2 + 1.0, kernel_size // 2 + 1.0)
    xx, yy = np.meshgrid(ax, ax)
    xy = np.hstack(
        (xx.reshape(kernel_size * kernel_size, 1),
         yy.reshape(kernel_size * kernel_size, 1))
    ).reshape(kernel_size, kernel_size, 2)
    return xy, xx, yy


def bivariate_gaussian(kernel_size: int, sig_x: float, sig_y: float,
                       theta: float, isotropic: bool = True) -> np.ndarray:
    """degradations.py:84-109."""
    xy, _, _ = mesh_grid(kernel_size)
    if isotropic:
        sigma = np.array([[sig_x ** 2, 0], [0, sig_x ** 2]])
    else:
        sigma = sigma_matrix2(sig_x, sig_y, theta)
    inverse = np.linalg.inv(sigma)
    kernel = np.exp(-0.5 * np.sum(np.dot(xy, inverse) * xy, 2))
    return kernel / np.sum(kernel)


def random_mixed_kernel(
    rng: np.random.Generator,
    kernel_size: int = 41,
    sigma_range: Tuple[float, float] = (0.6, 10.0),
    isotropic_prob: float = 0.5,
) -> np.ndarray:
    """A practical subset of random_mixed_kernels (degradations.py:327-390):
    iso/aniso gaussians (the GFPGAN config uses ['iso','aniso'] 50/50)."""
    iso = rng.uniform() < isotropic_prob
    sig_x = rng.uniform(*sigma_range)
    if iso:
        return bivariate_gaussian(kernel_size, sig_x, sig_x, 0.0, True)
    sig_y = rng.uniform(sigma_range[0], sig_x)
    theta = rng.uniform(-np.pi, np.pi)
    return bivariate_gaussian(kernel_size, sig_x, sig_y, theta, False)


def filter2d(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """cv2.filter2D equivalent (reflect-101 border), [H,W,C] float."""
    from scipy.ndimage import convolve

    out = np.empty_like(img)
    for c in range(img.shape[2]):
        out[:, :, c] = convolve(img[:, :, c], kernel, mode="mirror")
    return out


def add_gaussian_noise(img: np.ndarray, rng: np.random.Generator,
                       sigma: float, gray: bool = False,
                       clip: bool = True) -> np.ndarray:
    """degradations.py:420-459. img in [0, 1]."""
    if gray:
        noise = rng.normal(0, sigma / 255.0, img.shape[:2])[..., None]
    else:
        noise = rng.normal(0, sigma / 255.0, img.shape)
    out = img + noise
    return np.clip(out, 0, 1) if clip else out


def add_jpg_compression(img: np.ndarray, quality: int = 90) -> np.ndarray:
    """degradations.py:732-749 via PIL. img [H,W,3] in [0, 1]."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.clip(img * 255.0, 0, 255).astype(np.uint8)).save(
        buf, format="JPEG", quality=int(quality)
    )
    buf.seek(0)
    return np.asarray(Image.open(buf), np.float32) / 255.0


def resize_area(img: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """cv2.INTER_LINEAR-style resize for the degradation chain (host)."""
    from s2v_tpu.io.native import crop_resize_u8f32

    h, w = img.shape[:2]
    return crop_resize_u8f32(
        np.clip(img * 255, 0, 255).astype(np.uint8), (0, h, 0, w), out_hw,
        scale=1.0 / 255.0,
    )


def degrade(
    img: np.ndarray,
    rng: Optional[np.random.Generator] = None,
    blur_kernel_size: int = 41,
    blur_sigma: Tuple[float, float] = (0.1, 10.0),
    downsample_range: Tuple[float, float] = (0.8, 8.0),
    noise_range: Optional[Tuple[float, float]] = (0.0, 20.0),
    jpeg_range: Optional[Tuple[int, int]] = (60, 100),
) -> np.ndarray:
    """The FFHQDegradationDataset chain (ffhq_degradation_dataset.py:160-190):
    blur -> downsample -> noise -> jpeg -> resize back. img [H,W,3] in [0,1]."""
    rng = rng or np.random.default_rng(0)
    h, w = img.shape[:2]
    kernel = random_mixed_kernel(rng, blur_kernel_size, blur_sigma)
    lq = filter2d(img, kernel)
    scale = rng.uniform(*downsample_range)
    lq = resize_area(lq, (max(int(h / scale), 8), max(int(w / scale), 8)))
    if noise_range is not None:
        lq = add_gaussian_noise(lq, rng, rng.uniform(*noise_range))
    if jpeg_range is not None:
        lq = add_jpg_compression(lq, rng.integers(*jpeg_range))
    return resize_area(lq, (h, w))
