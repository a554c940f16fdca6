"""Degradation pipeline tests: kernel math vs the reference formulas,
chain integrity."""

import numpy as np

from s2v_tpu.prep.degradations import (
    add_gaussian_noise,
    add_jpg_compression,
    bivariate_gaussian,
    degrade,
    filter2d,
    random_mixed_kernel,
    sigma_matrix2,
)

RNG = np.random.default_rng(241)


def test_bivariate_gaussian_matches_reference_formula():
    k = bivariate_gaussian(21, 3.0, 1.5, 0.7, isotropic=False)
    assert k.shape == (21, 21)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-9)
    # reference formula recomputed directly
    ax = np.arange(-10.0, 11.0)
    xx, yy = np.meshgrid(ax, ax)
    xy = np.stack([xx, yy], -1)
    inv = np.linalg.inv(sigma_matrix2(3.0, 1.5, 0.7))
    want = np.exp(-0.5 * np.sum(np.dot(xy, inv) * xy, 2))
    want /= want.sum()
    np.testing.assert_allclose(k, want, rtol=1e-9)


def test_filter2d_preserves_mean():
    img = RNG.random((32, 32, 3)).astype(np.float32)
    k = bivariate_gaussian(11, 2.0, 2.0, 0.0)
    out = filter2d(img, k)
    np.testing.assert_allclose(out.mean(), img.mean(), rtol=0.05)


def test_noise_and_jpeg():
    img = RNG.random((64, 64, 3)).astype(np.float32)
    noisy = add_gaussian_noise(img, RNG, sigma=20.0)
    assert noisy.min() >= 0 and noisy.max() <= 1
    assert np.abs(noisy - img).mean() > 0.01
    jpg = add_jpg_compression(img, 30)
    assert jpg.shape == img.shape
    assert np.abs(jpg - img).mean() > 0.001  # lossy


def test_degrade_chain():
    img = RNG.random((128, 128, 3)).astype(np.float32)
    lq = degrade(img, RNG)
    assert lq.shape == img.shape
    assert lq.min() >= 0 and lq.max() <= 1.0001
    assert np.abs(lq - img).mean() > 0.01  # actually degraded
