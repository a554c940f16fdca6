"""FaceEnhancer orchestration tests: geometry vs reference formulas, and an
end-to-end smoke with random weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2v_tpu.pipeline.enhance import (
    FaceEnhancer,
    affine_sample_grid,
    get_reference_facial_points,
    paste_mask_512,
    umeyama_with_scale,
    warp_and_crop_transforms,
)

RNG = np.random.RandomState(121)


def test_reference_facial_points_512():
    """FaceEnhancement config: 512^2, inner padding 0.25, default square."""
    pts = get_reference_facial_points((512, 512), 0.25, (0, 0), True)
    assert pts.shape == (5, 2)
    # known values: default square turns (96,112) into (112,112); scale
    # 512/168; x shift +8 from squaring.
    scale = 512.0 / (112 + round(112 * 0.5))
    want_x0 = (30.29459953 + 8.0 + 112 * 0.25) * scale
    np.testing.assert_allclose(pts[0, 0], want_x0, rtol=1e-5)
    # symmetric eyes about the vertical center
    np.testing.assert_allclose(
        pts[0, 0] + pts[1, 0], 512.0 * (30.29459953 + 8 + 65.53179932 + 8 + 2 * 28)
        / (168.0), rtol=1e-5,
    )


def test_umeyama_inverse_transform_roundtrip():
    src = RNG.rand(5, 2).astype(np.float64) * 100
    ref = get_reference_facial_points((512, 512)).astype(np.float64)
    tfm, tfm_inv = warp_and_crop_transforms(src, ref)
    # forward then inverse returns the original points
    fwd = src @ tfm[:, :2].T + tfm[:, 2]
    back = fwd @ tfm_inv[:, :2].T + tfm_inv[:, 2]
    np.testing.assert_allclose(back, src, rtol=1e-5, atol=1e-5)


def test_affine_grid_translation():
    """warpAffine with a pure translation samples src at (x - tx, y - ty)."""
    img = RNG.rand(1, 32, 32, 3).astype(np.float32)
    tfm = np.array([[1.0, 0.0, 5.0], [0.0, 1.0, 3.0]])
    grid = affine_sample_grid(tfm, (32, 32), (32, 32))
    from s2v_tpu.ops.warp import grid_sample_bilinear

    out = np.asarray(grid_sample_bilinear(jnp.asarray(img), jnp.asarray(grid)[None]))[0]
    np.testing.assert_allclose(out[3:, 5:], img[0][: 32 - 3, : 32 - 5],
                               rtol=1e-5, atol=1e-5)


def test_paste_mask_shape():
    m = paste_mask_512()
    assert m.shape == (512, 512)
    assert m[256, 256] > 0.9 and m[0, 0] < 0.1


@pytest.mark.slow
def test_face_enhancer_smoke():
    """Random weights end-to-end: detection forced valid via low threshold
    on a small frame; checks the composite path runs and output is sane."""
    from slim_zoo import (slim_facegan_vars, slim_parsenet_vars,
                          slim_retinaface_vars)

    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    in_size = 64
    # slim widths throughout: the drivers infer geometry from the trees
    models = {
        "retinaface": slim_retinaface_vars(k1),
        "facegan": slim_facegan_vars(k2, in_size),
        "parsenet": slim_parsenet_vars(k3),
    }
    enhancer = FaceEnhancer(models, in_size=in_size, threshold=-1.0)
    frame = (RNG.rand(64, 64, 3) * 255).astype(np.uint8)
    out = enhancer(frame)
    assert out.shape == frame.shape and out.dtype == np.uint8
    out2 = enhancer(frame, laplacian_blend=True, bbox=(10, 50, 10, 50))
    assert out2.shape == frame.shape


@pytest.mark.slow
def test_enhance_split_matches_fused():
    """The >=1024 split path (4 chained device programs) must equal the
    fused single program — same jits, same math, only the program
    boundaries differ. XLA fuses each program independently, so f32
    reassociation can move isolated pixels across a uint8 rounding
    boundary (input-dependent: exact equality held for some module-RNG
    orderings and not others) — assert within-1-gray-level agreement.
    Validated at a small in_size where both compile everywhere."""
    from slim_zoo import (slim_facegan_vars, slim_parsenet_vars,
                          slim_retinaface_vars)

    rng = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(rng, 3)
    in_size = 64
    # slim widths throughout: the drivers infer geometry from the trees
    models = {
        "retinaface": slim_retinaface_vars(k1),
        "facegan": slim_facegan_vars(k2, in_size),
        "parsenet": slim_parsenet_vars(k3),
    }
    enhancer = FaceEnhancer(models, in_size=in_size, threshold=-1.0,
                            chunk=2)
    frames = (RNG.rand(3, 64, 64, 3) * 255).astype(np.uint8)

    for kwargs in (
        {"face_enhance": True},
        {"face_enhance": False, "possion_blending": True},
        {"face_enhance": True, "possion_blending": True,
         "bboxes": np.asarray([[10, 50, 10, 50]] * 3)},
    ):
        enhancer._fuse_full = True
        fused = enhancer.process_batch(frames, **kwargs)
        enhancer._fuse_full = False
        split = enhancer.process_batch(frames, **kwargs)
        d = np.abs(fused.astype(np.int32) - split.astype(np.int32))
        assert d.max() <= 1, (d.max(), (d > 0).mean())


@pytest.mark.slow
def test_face_enhancer_fast_knobs_close_to_default():
    """The opt-in perf knobs (det_dtype=bfloat16, parse_size=256,
    approx_warp) must produce composites close to the default exact path:
    same shapes/dtype, and the bulk of pixels within a few gray levels
    (mask-boundary and warp-tap pixels may differ more)."""
    from slim_zoo import (slim_facegan_vars, slim_parsenet_vars,
                          slim_retinaface_vars)

    rng = jax.random.PRNGKey(11)
    k1, k2, k3 = jax.random.split(rng, 3)
    in_size = 64
    # slim widths throughout: the drivers infer geometry from the trees
    models = {
        "retinaface": slim_retinaface_vars(k1),
        "facegan": slim_facegan_vars(k2, in_size),
        "parsenet": slim_parsenet_vars(k3),
    }
    frame = (RNG.rand(64, 64, 3) * 255).astype(np.uint8)
    base = FaceEnhancer(models, in_size=in_size, threshold=-1.0)
    # parse_size alone (same detections, same warps): only the mask
    # boundary can move, so the composite stays within a few gray levels
    fast = FaceEnhancer(models, in_size=in_size, threshold=-1.0,
                        parse_size=256)
    ob = base(frame)
    of = fast(frame)
    assert of.shape == ob.shape and of.dtype == np.uint8
    d = np.abs(ob.astype(np.float32) - of.astype(np.float32))
    assert (d <= 8).mean() > 0.90, (d.mean(), (d <= 8).mean())
    # approx_warp quality is angle-dependent (sheared separable passes) and
    # det_dtype=bfloat16 perturbs the detections themselves — with
    # random-init weights the alignment can move outright (real-weights
    # deltas are the documented ~50 dB / sub-pixel numbers; controlled
    # transforms are covered by test_warp_shear.py). Assert a sane
    # composite for the full fast-knob stack here.
    allfast = FaceEnhancer(models, in_size=in_size, threshold=-1.0,
                           det_dtype="bfloat16", parse_size=256,
                           approx_warp=True)
    oa = allfast(frame)
    assert oa.shape == frame.shape and oa.dtype == np.uint8
    assert np.isfinite(oa.astype(np.float32)).all()
