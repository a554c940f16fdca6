"""Pipeline utility tests: semantic windows, pyramid blending, alignment
warps (PIL as the oracle for PIL-convention transforms)."""

import numpy as np
from PIL import Image

import jax.numpy as jnp

from s2v_tpu.pipeline.align import (
    calc_alignment_coefficients,
    perspective_sample_grid,
    quad_sample_grid,
    warp_by_grid,
)
from s2v_tpu.pipeline.utils import (
    find_crop_norm_ratio,
    gaussian_blur,
    laplacian_pyramid_blend,
    mask_postprocess,
    pyr_down,
    pyr_up,
    split_coeff,
    transform_semantic,
)

RNG = np.random.RandomState(21)


def smooth_image(h, w, c=3):
    """Low-frequency random image (reduces resampling-convention noise)."""
    small = RNG.rand(h // 8 + 2, w // 8 + 2, c) * 255
    img = np.asarray(
        Image.fromarray(small.astype(np.uint8)).resize((w, h), Image.BILINEAR)
    )
    return img.astype(np.float32)


def test_transform_semantic_matches_reference_loop():
    n = 40
    semantic = RNG.randn(n, 262).astype(np.float32)
    ratio = np.float32(1.23)

    got = np.asarray(transform_semantic(jnp.asarray(semantic), ratio))
    assert got.shape == (n, 73, 26)

    # reference per-frame computation (inference_utils.py:73-91)
    for idx in [0, 1, 13, 20, n - 1]:
        seq = [min(max(i, 0), n - 1) for i in range(idx - 13, idx + 13)]
        coeff = semantic[seq].copy()
        ex = coeff[:, 80:144]
        angles = coeff[:, 224:227]
        translation = coeff[:, 254:257]
        crop = coeff[:, 259:262].copy()
        crop[:, -3] = crop[:, -3] * ratio
        want = np.concatenate([ex, angles, translation, crop], 1).T  # [73, 26]
        np.testing.assert_allclose(got[idx], want, rtol=1e-5, atol=1e-5)


def test_find_crop_norm_ratio_matches_reference():
    src = RNG.randn(1, 262).astype(np.float32)
    tgt = RNG.randn(30, 262).astype(np.float32)
    alpha = 0.3
    exp_diff = np.mean(np.abs(tgt[:, 80:144] - src[:, 80:144]), 1)
    angle_diff = np.mean(np.abs(tgt[:, 224:227] - src[:, 224:227]), 1)
    index = np.argmin(alpha * exp_diff + (1 - alpha) * angle_diff)
    want = src[:, -3] / tgt[index : index + 1, -3]
    got = np.asarray(find_crop_norm_ratio(jnp.asarray(src), jnp.asarray(tgt)))
    np.testing.assert_allclose(got, want[0], rtol=1e-5)


def test_split_coeff_shapes():
    c = split_coeff(jnp.zeros((3, 257)))
    assert c["id"].shape == (3, 80) and c["exp"].shape == (3, 64)
    assert c["tex"].shape == (3, 80) and c["angle"].shape == (3, 3)
    assert c["gamma"].shape == (3, 27) and c["trans"].shape == (3, 3)


def test_pyramid_shapes_and_roundtrip():
    x = jnp.asarray(RNG.rand(1, 64, 64, 3).astype(np.float32))
    d = pyr_down(x)
    assert d.shape == (1, 32, 32, 3)
    u = pyr_up(d)
    assert u.shape == (1, 64, 64, 3)
    # pyrUp(pyrDown(smooth)) approximates smooth input
    xs = jnp.asarray(smooth_image(64, 64)[None] / 255.0)
    err = np.abs(np.asarray(pyr_up(pyr_down(xs)) - xs)).mean()
    assert err < 0.05, err


def test_pyramid_separable_matches_dense_25tap():
    """pyr_down/pyr_up run the 5-tap kernel as two separable passes (with
    the decimation fused into the strides); pin them to the dense 25-tap
    outer-product formulation (the cv2 definition)."""
    import jax

    x = jnp.asarray(RNG.rand(2, 32, 48, 3).astype(np.float32))
    k1 = np.asarray([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0
    k2d = np.outer(k1, k1)

    def dense5(z, k):
        c = z.shape[-1]
        zp = jnp.pad(z, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
        w = jnp.tile(jnp.asarray(k)[:, :, None, None], (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            zp, w, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    np.testing.assert_allclose(
        np.asarray(pyr_down(x)), np.asarray(dense5(x, k2d)[:, ::2, ::2, :]),
        rtol=1e-6, atol=1e-6)
    d = pyr_down(x)
    b, h, w, c = d.shape
    z = jnp.zeros((b, h, 2, w, 2, c), d.dtype)
    z = z.at[:, :, 0, :, 0, :].set(d).reshape(b, 2 * h, 2 * w, c)
    np.testing.assert_allclose(
        np.asarray(pyr_up(d)), np.asarray(dense5(z, 4.0 * k2d)),
        rtol=1e-5, atol=1e-5)


def test_laplacian_blend_mask_extremes():
    a = jnp.asarray(smooth_image(128, 128)[None])
    b = jnp.asarray(smooth_image(128, 128)[None])
    ones = jnp.ones((1, 128, 128, 1))
    out_a = np.asarray(laplacian_pyramid_blend(a, b, ones, num_levels=5))
    np.testing.assert_allclose(out_a, np.asarray(a), rtol=1e-4, atol=1e-2)
    out_b = np.asarray(laplacian_pyramid_blend(a, b, 0 * ones, num_levels=5))
    np.testing.assert_allclose(out_b, np.asarray(b), rtol=1e-4, atol=1e-2)


def test_gaussian_blur_matmul_matches_depthwise_conv():
    """The MXU banded-matmul formulation must equal the reference
    depthwise-conv formulation (cv2 GaussianBlur semantics, REFLECT_101)
    to float precision — it replaced the conv path for speed only (the
    101-tap single-channel depthwise conv lowers to the VPU at ~0.1
    TFLOP/s; see tools/out/r5_xplane_gpen512_step5.json)."""
    import jax

    def conv_blur(x, ksize, sigma):
        from s2v_tpu.pipeline.utils import _gaussian_kernel1d

        c = x.shape[-1]
        k = _gaussian_kernel1d(ksize, sigma)
        pad = ksize // 2
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                    mode="reflect")
        kv = jnp.asarray(k, x.dtype)[:, None, None, None]
        kh = jnp.asarray(k, x.dtype)[None, :, None, None]
        x = jax.lax.conv_general_dilated(
            x, jnp.tile(kv, (1, 1, 1, c)), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)
        return jax.lax.conv_general_dilated(
            x, jnp.tile(kh, (1, 1, 1, c)), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    for shape, ks, sg in [((2, 96, 96, 1), 101, 11.0),
                          ((1, 64, 80, 3), 5, 1.1),
                          ((1, 52, 52, 1), 31, 4.0)]:
        x = jnp.asarray(RNG.rand(*shape).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(gaussian_blur(x, ks, sg)),
            np.asarray(conv_blur(x, ks, sg)), rtol=1e-5, atol=1e-6)


def test_mask_postprocess_border_zero():
    m = jnp.ones((1, 256, 256))
    out = np.asarray(mask_postprocess(m))
    assert out.shape == (1, 256, 256)
    assert out[0, 0, 0] < 0.1  # border killed
    assert out[0, 128, 128] > 0.8  # center survives


def test_quad_transform_matches_pil():
    src = smooth_image(100, 120)
    quad = np.asarray(
        [[10.0, 8.0], [12.0, 80.0], [100.0, 90.0], [95.0, 5.0]], np.float64
    )
    out_size = 64
    pil = Image.fromarray(src.astype(np.uint8)).transform(
        (out_size, out_size), Image.QUAD, quad.flatten(), Image.BILINEAR
    )
    want = np.asarray(pil).astype(np.float32)

    grid = quad_sample_grid(quad, out_size, src.shape[:2])
    got = np.asarray(warp_by_grid(jnp.asarray(src[None]), jnp.asarray(grid)))[0]
    # interior-pixel comparison (PIL quantizes to uint8)
    diff = np.abs(got[2:-2, 2:-2] - want[2:-2, 2:-2])
    assert np.percentile(diff, 99) <= 2.0, np.percentile(diff, 99)


def test_perspective_transform_matches_pil():
    src = smooth_image(96, 96)
    # map the unit square corners to a quad (as datagen does: quad -> square)
    quad = np.asarray([[5.0, 4.0], [8.0, 88.0], [90.0, 92.0], [85.0, 6.0]])
    square = [[0, 0], [0, 96], [96, 96], [96, 0]]
    coeffs = calc_alignment_coefficients(quad, square)
    pil = Image.fromarray(src.astype(np.uint8)).transform(
        (128, 128), Image.PERSPECTIVE, coeffs, Image.BILINEAR
    )
    want = np.asarray(pil).astype(np.float32)
    grid = perspective_sample_grid(coeffs, (128, 128), src.shape[:2])
    got = np.asarray(warp_by_grid(jnp.asarray(src[None]), jnp.asarray(grid)))[0]
    # compare where samples are interior (PIL edge fill conventions differ)
    ix = (grid[..., 0] + 1) * src.shape[1] / 2
    iy = (grid[..., 1] + 1) * src.shape[0] / 2
    interior = (ix > 2) & (ix < src.shape[1] - 3) & (iy > 2) & (iy < src.shape[0] - 3)
    diff = np.abs(got - want)[interior]
    assert np.percentile(diff, 99) <= 2.0, np.percentile(diff, 99)


def test_calc_alignment_coefficients_identity():
    pts = [[0, 0], [0, 10], [10, 10], [10, 0]]
    coeffs = calc_alignment_coefficients(pts, pts)
    np.testing.assert_allclose(coeffs, [1, 0, 0, 0, 1, 0, 0, 0], atol=1e-8)
