"""Degradation pipeline tests: kernel math golden-checked against the
reference module (third_part/GPEN/training/data_loader/degradations.py,
imported with cv2/torchvision stubbed), noise/jpeg/chain integrity."""

import sys
import types

import numpy as np
import pytest

from s2v_tpu.prep.degradations import (
    GFPGANDegrader,
    add_gaussian_noise,
    add_jpg_compression,
    add_poisson_noise,
    bivariate_gaussian,
    bivariate_generalized_gaussian,
    bivariate_plateau,
    cdf2,
    circular_lowpass_kernel,
    degrade,
    face_batches,
    filter2d,
    generate_poisson_noise,
    mesh_grid,
    random_add_gaussian_noise,
    random_bivariate_gaussian,
    random_bivariate_generalized_gaussian,
    random_bivariate_plateau,
    random_mixed_kernel,
    random_mixed_kernels,
    rgb_to_gray,
    sigma_matrix2,
)

RNG = np.random.default_rng(241)


@pytest.fixture(scope="module")
def ref_degradations():
    """Import the reference module with its GPU/codec deps stubbed (cv2 and
    torchvision are absent from this image; the kernel functions under test
    touch neither)."""
    import importlib.machinery

    stubbed = []
    for name in ("cv2", "torchvision", "torchvision.transforms",
                 "torchvision.transforms.functional_tensor"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            # a bare ModuleType has __spec__ = None, which makes any later
            # importlib.util.find_spec(name) raise ValueError (transformers
            # probes cv2 that way) — install a real spec
            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            if name.endswith("functional_tensor"):
                mod.rgb_to_grayscale = lambda *a, **k: None
            if name == "cv2":
                mod.COLOR_BGR2GRAY = 6
                mod.IMWRITE_JPEG_QUALITY = 1
            sys.modules[name] = mod
            stubbed.append(name)
    sys.path.insert(0, "/root/reference/third_part/GPEN/training/data_loader")
    import degradations as ref

    yield ref
    sys.path.remove("/root/reference/third_part/GPEN/training/data_loader")
    for name in stubbed:
        sys.modules.pop(name, None)


def test_bivariate_gaussian_matches_reference(ref_degradations):
    ref = ref_degradations
    for iso in (True, False):
        k = bivariate_gaussian(21, 3.0, 1.5, 0.7, isotropic=iso)
        want = ref.bivariate_Gaussian(21, 3.0, 1.5, 0.7, isotropic=iso)
        np.testing.assert_allclose(k, want, rtol=1e-12)
        np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-9)


def test_generalized_gaussian_matches_reference(ref_degradations):
    ref = ref_degradations
    for beta in (0.5, 1.0, 4.0):
        for iso in (True, False):
            k = bivariate_generalized_gaussian(
                21, 2.5, 1.2, -0.4, beta, isotropic=iso)
            want = ref.bivariate_generalized_Gaussian(
                21, 2.5, 1.2, -0.4, beta, isotropic=iso)
            np.testing.assert_allclose(k, want, rtol=1e-12)
    # beta=1 collapses to the plain Gaussian
    np.testing.assert_allclose(
        bivariate_generalized_gaussian(13, 2.0, 2.0, 0.0, 1.0),
        bivariate_gaussian(13, 2.0, 2.0, 0.0), rtol=1e-12)


def test_plateau_matches_reference(ref_degradations):
    ref = ref_degradations
    for beta in (1.0, 2.0):
        for iso in (True, False):
            k = bivariate_plateau(21, 2.5, 1.2, 0.9, beta, isotropic=iso)
            want = ref.bivariate_plateau(21, 2.5, 1.2, 0.9, beta,
                                         isotropic=iso)
            np.testing.assert_allclose(k, want, rtol=1e-12)


def test_sinc_kernel_matches_reference(ref_degradations):
    ref = ref_degradations
    for cutoff in (np.pi / 3, np.pi):
        k = circular_lowpass_kernel(cutoff, 21, pad_to=31)
        want = ref.circular_lowpass_kernel(cutoff, 21, pad_to=31)
        np.testing.assert_allclose(k, want, rtol=1e-10)
        assert k.shape == (31, 31)
        np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-9)


def test_cdf2_matches_reference(ref_degradations):
    ref = ref_degradations
    grid, _, _ = mesh_grid(9)
    d = np.array([[0.5, 0.1], [-0.2, 0.8]])
    np.testing.assert_allclose(cdf2(d, grid / 4.0),
                               ref.cdf2(d, grid / 4.0), rtol=1e-9)


def test_random_samplers_properties():
    for fn, extra in (
        (random_bivariate_gaussian, ()),
        (random_bivariate_generalized_gaussian, ((0.5, 8.0),)),
        (random_bivariate_plateau, ((1.0, 4.0),)),
    ):
        for iso in (True, False):
            rng = np.random.default_rng(3)
            k = fn(rng, 21, (0.6, 5.0), (0.6, 5.0), (-np.pi, np.pi), *extra,
                   noise_range=(0.75, 1.25), isotropic=iso)
            assert k.shape == (21, 21)
            np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-9)
            assert (k >= 0).all()
    # multiplicative kernel noise actually perturbs the kernel
    rng1, rng2 = np.random.default_rng(5), np.random.default_rng(5)
    clean = random_bivariate_gaussian(rng1, 21, (0.6, 5), (0.6, 5),
                                      (-np.pi, np.pi))
    noisy = random_bivariate_gaussian(rng2, 21, (0.6, 5), (0.6, 5),
                                      (-np.pi, np.pi),
                                      noise_range=(0.75, 1.25))
    assert np.abs(clean - noisy).max() > 0


def test_random_mixed_kernels_dispatch():
    """Each type routes to the matching sampler with the same rng stream."""
    cases = {
        "iso": lambda r: random_bivariate_gaussian(
            r, 17, (0.6, 5), (0.6, 5), (-np.pi, np.pi), isotropic=True),
        "aniso": lambda r: random_bivariate_gaussian(
            r, 17, (0.6, 5), (0.6, 5), (-np.pi, np.pi), isotropic=False),
        "generalized_iso": lambda r: random_bivariate_generalized_gaussian(
            r, 17, (0.6, 5), (0.6, 5), (-np.pi, np.pi), (0.5, 8),
            isotropic=True),
        "generalized_aniso": lambda r: random_bivariate_generalized_gaussian(
            r, 17, (0.6, 5), (0.6, 5), (-np.pi, np.pi), (0.5, 8),
            isotropic=False),
        "plateau_iso": lambda r: random_bivariate_plateau(
            r, 17, (0.6, 5), (0.6, 5), (-np.pi, np.pi), (0.5, 8),
            isotropic=True),
        "plateau_aniso": lambda r: random_bivariate_plateau(
            r, 17, (0.6, 5), (0.6, 5), (-np.pi, np.pi), (0.5, 8),
            isotropic=False),
    }
    for name, direct in cases.items():
        rng_a = np.random.default_rng(11)
        got = random_mixed_kernels(rng_a, [name], [1.0], 17,
                                   (0.6, 5), (0.6, 5), (-np.pi, np.pi))
        rng_b = np.random.default_rng(11)
        rng_b.choice(1, p=[1.0])  # burn the type draw
        want = direct(rng_b)
        np.testing.assert_allclose(got, want, rtol=0, atol=0)
    with pytest.raises(ValueError):
        random_mixed_kernels(np.random.default_rng(0), ["nope"], [1.0])


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


def test_gray_noise_constant_across_channels():
    img = RNG.random((32, 32, 3)).astype(np.float32) * 0.5 + 0.25
    out = add_gaussian_noise(img, np.random.default_rng(0), sigma=15.0,
                             clip=False, gray=True)
    noise = out - img
    np.testing.assert_allclose(noise[..., 0], noise[..., 1], atol=1e-6)
    np.testing.assert_allclose(noise[..., 0], noise[..., 2], atol=1e-6)


def test_rounds_quantizes():
    img = RNG.random((16, 16, 3)).astype(np.float32)
    out = random_add_gaussian_noise(img, np.random.default_rng(1),
                                    (5.0, 10.0), rounds=True)
    np.testing.assert_allclose(out * 255.0, np.round(out * 255.0), atol=1e-4)


def test_poisson_noise_semantics():
    img = (np.tile(np.linspace(0.1, 0.9, 16)[:, None, None],
                   (1, 16, 3))).astype(np.float32)
    # scale linearity on the same stream
    n1 = generate_poisson_noise(img, np.random.default_rng(7), scale=1.0)
    n2 = generate_poisson_noise(img, np.random.default_rng(7), scale=2.0)
    np.testing.assert_allclose(n2, 2.0 * n1, rtol=1e-6)
    # gray noise: identical channels
    ng = generate_poisson_noise(img, np.random.default_rng(9),
                                gray_noise=True)
    np.testing.assert_allclose(ng[..., 0], ng[..., 2], rtol=1e-6)
    # shot noise variance grows with intensity (poisson property)
    big = add_poisson_noise(np.full((64, 64, 3), 0.8, np.float32),
                            np.random.default_rng(3), clip=False)
    small = add_poisson_noise(np.full((64, 64, 3), 0.1, np.float32),
                              np.random.default_rng(3), clip=False)
    assert big.std() > small.std()


def test_degrade_chain():
    img = RNG.random((64, 64, 3)).astype(np.float32)
    lq = degrade(img, RNG)
    assert lq.shape == img.shape
    assert lq.min() >= 0 and lq.max() <= 1
    assert np.abs(lq - img).mean() > 0.01  # actually degraded


def test_random_mixed_kernel_backcompat():
    k = random_mixed_kernel(RNG, 41)
    assert k.shape == (41, 41)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-9)


def test_gfpgan_degrader_and_batches():
    imgs = (RNG.random((3, 64, 64, 3)) * 255).astype(np.uint8)
    deg = GFPGANDegrader(gray_prob=1.0)  # force the grayscale branch
    gt, lq = deg(imgs[0].astype(np.float32) / 255.0,
                 np.random.default_rng(2))
    assert gt.shape == lq.shape == (64, 64, 3)
    np.testing.assert_allclose(gt[..., 0], gt[..., 1], rtol=1e-6)  # gray GT
    b = next(face_batches(imgs, batch_size=2,
                          rng=np.random.default_rng(4), steps=1))
    assert set(b) == {"lq", "hq"}
    assert b["lq"].shape == b["hq"].shape == (2, 64, 64, 3)
    assert b["lq"].min() >= -1.0 and b["lq"].max() <= 1.0
    assert np.abs(b["lq"] - b["hq"]).mean() > 0.005


def test_rgb_to_gray_bt601():
    img = np.zeros((2, 2, 3), np.float32)
    img[..., 1] = 1.0
    np.testing.assert_allclose(rgb_to_gray(img), np.full((2, 2), 0.587),
                               rtol=1e-6)
