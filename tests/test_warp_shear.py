"""affine_warp_shear (the opt-in approx warp, config model.approx_warp)
vs the exact gather-based affine_warp.

The shear path is algebraically exact in geometry (Catmull-Smith two-pass
factorization) but interpolates with a lerp-of-lerp per axis (the per-row
fractional shift is one lerp, the shared-stride MXU resample another), so
the effective kernel is a 3-tap composite per axis instead of bilinear's
2-tap tent. The composite's weights sum to 1 with first moment at the true
sample position, hence:
- linear-ramp images: EXACT for any similarity (any kernel with those two
  moment properties reproduces linear content),
- natural smooth content (incl. axis-aligned): high-PSNR agreement
  (~50 dB measured; worst-case pixels sit on curvature maxima).
Border ring excluded: the shear passes edge-replicate where the exact path
blends with zeros, so footprints are eroded with a zero-padded (constant
mode) minimum filter — reflect mode would keep output-canvas-edge pixels
whose neighborhood extends past the canvas.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from s2v_tpu.ops.warp import affine_warp, affine_warp_shear

RNG = np.random.RandomState(0)


def _similarity(theta_deg, scale, tx, ty):
    t = np.deg2rad(theta_deg)
    c, s = np.cos(t) * scale, np.sin(t) * scale
    return np.asarray([[c, -s, tx], [s, c, ty]], np.float32)


def _smooth(h, w, c=3):
    x = RNG.rand(h // 8, w // 8, c).astype(np.float32) * 255.0
    import jax

    img = jnp.asarray(x)[None]
    from s2v_tpu.ops.image import resize_bilinear

    return np.asarray(resize_bilinear(img, (h, w)))[0]


def _interior_mask(exact):
    """Non-zero region of the exact warp, eroded by a few pixels.

    mode='constant' so output-canvas-edge pixels (whose erosion window
    extends past the canvas) are excluded too — the shear path
    edge-replicates there where the exact path blends with zeros."""
    m = (np.abs(exact).sum(-1) > 1e-6).astype(np.float32)
    k = 5
    from scipy.ndimage import minimum_filter

    return minimum_filter(m, size=k, mode="constant", cval=0.0) > 0.5


def _psnr(exact, approx, m):
    mse = np.mean((exact - approx)[m] ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def test_shear_quality_axis_aligned():
    """Axis-aligned scale+translate: ~50 dB measured (the 3-tap composite
    kernel smooths slightly vs bilinear; worst pixels on curvature maxima)."""
    img = jnp.asarray(_smooth(96, 128)[None])
    mats = jnp.asarray(_similarity(0.0, 1.7, 12.3, -4.5)[None])
    exact = np.asarray(affine_warp(img, mats, (160, 144)))
    approx = np.asarray(affine_warp_shear(img, mats, (160, 144)))
    m = _interior_mask(exact[0]) & _interior_mask(approx[0])
    assert _psnr(exact[0], approx[0], m) > 45.0
    assert np.abs(exact[0] - approx[0])[m].max() < 16.0


def test_shear_exact_on_linear_ramp_any_rotation():
    h, w = 128, 128
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    ramp = np.stack([xs, ys, 0.3 * xs + 0.7 * ys], -1)
    img = jnp.asarray(ramp[None])
    for theta in (3.0, -9.0, 17.0):
        mats = jnp.asarray(_similarity(theta, 1.2, 5.0, -3.0)[None])
        exact = np.asarray(affine_warp(img, mats, (h, w)))
        approx = np.asarray(affine_warp_shear(img, mats, (h, w)))
        m = _interior_mask(exact[0]) & _interior_mask(approx[0])
        d = np.abs(exact[0] - approx[0])[m]
        assert d.max() < 5e-2, (theta, d.max())


def test_shear_quality_small_rotation_smooth_image():
    img = jnp.asarray(_smooth(128, 128)[None])
    worst = 100.0
    for theta in (2.0, 5.0, 8.0):
        mats = jnp.asarray(_similarity(theta, 0.9, 4.0, 2.0)[None])
        exact = np.asarray(affine_warp(img, mats, (128, 128)))
        approx = np.asarray(affine_warp_shear(img, mats, (128, 128)))
        m = _interior_mask(exact[0]) & _interior_mask(approx[0])
        worst = min(worst, _psnr(exact[0], approx[0], m))
    assert worst > 45.0, worst


def test_shear_inverse_flag_and_batch():
    imgs = jnp.asarray(
        np.stack([_smooth(64, 64), _smooth(64, 64)]))
    fwd = np.stack([_similarity(4.0, 1.1, 3.0, -2.0),
                    _similarity(-6.0, 0.8, -1.0, 5.0)])
    inv = np.stack([np.linalg.inv(np.vstack([m, [0, 0, 1]]))[:2]
                    for m in fwd]).astype(np.float32)
    a = np.asarray(affine_warp_shear(imgs, jnp.asarray(fwd), (64, 64)))
    b = np.asarray(affine_warp_shear(imgs, jnp.asarray(inv), (64, 64),
                                     inverse=True))
    np.testing.assert_allclose(a, b, atol=2e-2)


def test_shear_zero_outside_source():
    img = jnp.asarray(np.full((1, 32, 32, 1), 200.0, np.float32))
    # push the crop mostly off the image
    mats = jnp.asarray(_similarity(0.0, 1.0, 24.0, 24.0)[None])
    out = np.asarray(affine_warp_shear(img, mats, (32, 32)))[0, :, :, 0]
    exact = np.asarray(affine_warp(img, mats, (32, 32)))[0, :, :, 0]
    # the region mapping outside the source must be (near) zero, like cv2
    assert out[0, 0] == 0.0 and exact[0, 0] == 0.0
    assert abs(out[30, 30] - exact[30, 30]) < 1e-3
