"""Golden tests: s2v_tpu.ops primitives vs PyTorch CPU semantics.

The reference pipeline is PyTorch; checkpoint parity requires our primitives
to reproduce torch's exact sampling/normalization conventions. torch (CPU)
is available in the image, so every primitive is tested against it directly.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from s2v_tpu.ops import (
    avg_pool_2x2,
    grid_sample_bilinear,
    instance_norm_2d,
    layer_norm_chw,
    reflect_pad_2d,
    resize_bilinear,
    resize_nearest,
)
from s2v_tpu.ops.warp import convert_flow_to_deformation, warp_image

RNG = np.random.RandomState(0)


def nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def to_nhwc(t):
    return np.transpose(t.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((96, 96), (192, 192)), ((384, 384), (96, 96)), ((64, 48), (100, 100)),
     ((13, 17), (26, 34)), ((256, 256), (128, 128))],
)
def test_resize_bilinear_matches_torch(in_hw, out_hw):
    x = RNG.randn(2, *in_hw, 3).astype(np.float32)
    want = to_nhwc(
        F.interpolate(nchw(x), size=out_hw, mode="bilinear", align_corners=False)
    )
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((48, 48), (96, 96)), ((96, 96), (48, 48)), ((50, 50), (96, 96)),
     ((37, 21), (74, 42))],
)
def test_resize_nearest_matches_torch(in_hw, out_hw):
    x = RNG.randn(2, *in_hw, 3).astype(np.float32)
    want = to_nhwc(F.interpolate(nchw(x), size=out_hw, mode="nearest"))
    got = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_grid_sample_matches_torch():
    x = RNG.randn(2, 32, 28, 3).astype(np.float32)
    # Grid straying outside [-1, 1] to exercise zero padding.
    grid = (RNG.rand(2, 16, 20, 2).astype(np.float32) * 2.4 - 1.2)
    want = to_nhwc(
        F.grid_sample(
            nchw(x), torch.from_numpy(grid), mode="bilinear",
            padding_mode="zeros", align_corners=False,
        )
    )
    got = np.asarray(grid_sample_bilinear(jnp.asarray(x), jnp.asarray(grid)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_grid_sample_unrolled_groups_matches_torch():
    """total patches > 2^19 with a small group count hits the statically
    unrolled grouping branch (DNet's 256^2 x batch-16 warp shape class)."""
    x = RNG.randn(3, 512, 512, 2).astype(np.float32)
    grid = (RNG.rand(3, 512, 512, 2).astype(np.float32) * 2.2 - 1.1)
    want = to_nhwc(
        F.grid_sample(
            nchw(x), torch.from_numpy(grid), mode="bilinear",
            padding_mode="zeros", align_corners=False,
        )
    )
    got = np.asarray(grid_sample_bilinear(jnp.asarray(x), jnp.asarray(grid)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_grid_sample_offset_first_layout_matches_torch():
    """Outputs >= 2^20 pixels switch the gather to the offset-dims-first
    layout (ops/warp.py: kills the TPU tile-padding blowup at 2048^2);
    identical math, different buffer order — verify vs torch at a
    just-over-threshold output size."""
    x = RNG.randn(1, 24, 24, 2).astype(np.float32)
    grid = (RNG.rand(1, 1024, 1025, 2).astype(np.float32) * 2.4 - 1.2)
    want = to_nhwc(
        F.grid_sample(
            nchw(x), torch.from_numpy(grid), mode="bilinear",
            padding_mode="zeros", align_corners=False,
        )
    )
    got = np.asarray(grid_sample_bilinear(jnp.asarray(x), jnp.asarray(grid)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_warp_image_matches_reference_flow_path():
    """Mirror futils/flow_util.py: flow at 8^2 warping a 32^2 image."""
    img = RNG.randn(2, 32, 32, 3).astype(np.float32)
    flow = (RNG.randn(2, 8, 8, 2) * 3).astype(np.float32)

    # torch reference computation (flow_util.py:3-56 semantics)
    tflow = nchw(flow)
    b, c, h, w = tflow.shape
    flow_norm = 2 * torch.cat([tflow[:, :1] / (w - 1), tflow[:, 1:] / (h - 1)], 1)
    xs = torch.linspace(-1, 1, w)
    ys = torch.linspace(-1, 1, h)
    yy, xx = torch.meshgrid(ys, xs, indexing="ij")
    grid = torch.stack([xx, yy], dim=-1)[None].expand(b, -1, -1, -1)
    deform = grid + flow_norm.permute(0, 2, 3, 1)
    deform_up = F.interpolate(
        deform.permute(0, 3, 1, 2), size=(32, 32), mode="bilinear"
    ).permute(0, 2, 3, 1)
    want = to_nhwc(F.grid_sample(nchw(img), deform_up))

    deformation = convert_flow_to_deformation(jnp.asarray(flow))
    got = np.asarray(warp_image(jnp.asarray(img), deformation))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_layer_norm_chw_matches_torch():
    x = RNG.randn(3, 12, 12, 16).astype(np.float32)
    weight = RNG.randn(16).astype(np.float32)
    bias = RNG.randn(16).astype(np.float32)
    tx = nchw(x)
    shape = tx.shape[1:]
    want = to_nhwc(
        F.layer_norm(
            tx, shape,
            torch.from_numpy(weight)[:, None, None].expand(shape),
            torch.from_numpy(bias)[:, None, None].expand(shape),
        )
    )
    got = np.asarray(
        layer_norm_chw(jnp.asarray(x), jnp.asarray(weight), jnp.asarray(bias))
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_instance_norm_matches_torch():
    x = RNG.randn(3, 10, 14, 8).astype(np.float32)
    want = to_nhwc(F.instance_norm(nchw(x)))
    got = np.asarray(instance_norm_2d(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_avg_pool_matches_torch():
    x = RNG.randn(2, 16, 24, 5).astype(np.float32)
    want = to_nhwc(F.avg_pool2d(nchw(x), 2))
    got = np.asarray(avg_pool_2x2(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_reflect_pad_matches_torch():
    x = RNG.randn(2, 9, 9, 4).astype(np.float32)
    want = to_nhwc(F.pad(nchw(x), (2, 2, 2, 2), mode="reflect"))
    got = np.asarray(reflect_pad_2d(jnp.asarray(x), 2))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_crop_resize_boxes_matches_per_frame_resize():
    from s2v_tpu.ops.warp import crop_resize_boxes

    imgs = RNG.rand(3, 60, 80, 3).astype(np.float32)
    boxes = np.asarray([[5, 10, 55, 50], [0, 0, 80, 60], [20, 5, 44, 37]],
                       np.float32)
    got = np.asarray(crop_resize_boxes(jnp.asarray(imgs), boxes, (32, 32)))
    for i, (x1, y1, x2, y2) in enumerate(boxes.astype(int)):
        want = to_nhwc(
            F.interpolate(
                nchw(imgs[i : i + 1, y1:y2, x1:x2]), size=(32, 32),
                mode="bilinear", align_corners=False,
            )
        )[0]
        # interior matches exactly; the border ring may sample true image
        # neighbors instead of crop-clamped pixels
        np.testing.assert_allclose(got[i, 1:-1, 1:-1], want[1:-1, 1:-1],
                                   rtol=1e-4, atol=1e-4)


def test_paste_resize_boxes_matches_per_frame_loop():
    """Batched paste-back == resize each pred to its box + slice assign."""
    from s2v_tpu.ops.image import resize_bilinear
    from s2v_tpu.ops.warp import paste_resize_boxes

    rng = np.random.RandomState(7)
    frames = rng.rand(3, 40, 48, 3).astype(np.float32) * 255
    preds = rng.rand(3, 16, 16, 3).astype(np.float32) * 255
    boxes = np.asarray([[4, 6, 20, 30], [0, 0, 48, 40], [10, 5, 11, 6]],
                       np.int32)  # interior, full-frame, degenerate 1x1

    got = np.asarray(paste_resize_boxes(
        jnp.asarray(frames), jnp.asarray(preds), jnp.asarray(boxes)))

    want = frames.copy()
    for k, (x1, y1, x2, y2) in enumerate(boxes):
        p = np.asarray(resize_bilinear(
            jnp.asarray(preds[k:k + 1]), (y2 - y1, x2 - x1)))[0]
        want[k, y1:y2, x1:x2] = p
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-3)


def test_grid_sample_offset_first_batched_matches_torch():
    """Batched offset-first form: batch is folded into the gather's channel
    minor (ops/warp.py), so a per-frame indexing bug would smear frames
    into each other — compare a 3-frame batch vs torch."""
    x = RNG.randn(3, 20, 24, 5).astype(np.float32)
    grid = (RNG.rand(3, 512, 360, 2).astype(np.float32) * 2.4 - 1.2)
    want = to_nhwc(
        F.grid_sample(
            nchw(x), torch.from_numpy(grid), mode="bilinear",
            padding_mode="zeros", align_corners=False,
        )
    )
    got = np.asarray(grid_sample_bilinear(jnp.asarray(x), jnp.asarray(grid)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
