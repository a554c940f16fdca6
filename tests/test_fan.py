"""FAN parity vs the reference torch implementation and heatmap-decode
semantics vs the reference's per-landmark loop (utils.py:132-163)."""

import importlib.util

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from s2v_tpu.models.fan import (
    FAN,
    box_to_center_scale,
    crop_faces_batched,
    heatmaps_to_landmarks,
)
from s2v_tpu.utils.weights import convert_fan

RNG = np.random.RandomState(44)


def load_ref_models():
    spec = importlib.util.spec_from_file_location(
        "ref_fan_models", "/root/reference/third_part/face_detection/models.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fan_forward_parity():
    torch.manual_seed(5)
    mod = load_ref_models()
    ref = mod.FAN(num_modules=2).eval()  # 2 stacks: faster test, covers bl/al
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_fan(sd, num_modules=2)

    x = RNG.rand(1, 128, 128, 3).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))[-1].numpy()
    got = FAN(num_modules=2).apply(
        jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x)
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.shape == (1, 68, 32, 32)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-3)


def reference_get_preds(hm_nchw, centers, scales):
    """Numpy port of utils.py get_preds_fromhm + inverse transform."""
    b, n, hh, ww = hm_nchw.shape
    out = np.zeros((b, n, 2), np.float32)
    for i in range(b):
        for j in range(n):
            hm_ = hm_nchw[i, j]
            idx = hm_.argmax()
            idx1 = idx + 1  # 1-indexed
            px1 = (idx1 - 1) % ww + 1
            py1 = np.floor((idx1 - 1) / hh) + 1
            pX, pY = int(px1) - 1, int(py1) - 1
            fx, fy = float(px1), float(py1)
            if 0 < pX < ww - 1 and 0 < pY < hh - 1:
                dx = hm_[pY, pX + 1] - hm_[pY, pX - 1]
                dy = hm_[pY + 1, pX] - hm_[pY - 1, pX]
                fx += np.sign(dx) * 0.25
                fy += np.sign(dy) * 0.25
            fx -= 0.5
            fy -= 0.5
            h = 200.0 * scales[i]
            out[i, j, 0] = fx * h / hh + centers[i, 0] - h / 2
            out[i, j, 1] = fy * h / hh + centers[i, 1] - h / 2
    return out


def test_heatmap_decode_matches_reference():
    b, n, hh, ww = 2, 68, 64, 64
    hm = RNG.rand(b, n, hh, ww).astype(np.float32)
    centers = RNG.rand(b, 2).astype(np.float32) * 200 + 50
    scales = RNG.rand(b).astype(np.float32) + 0.8

    want = reference_get_preds(hm, centers, scales)
    got = np.asarray(
        heatmaps_to_landmarks(
            jnp.asarray(hm.transpose(0, 2, 3, 1)),
            jnp.asarray(centers), jnp.asarray(scales),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_box_to_center_scale():
    boxes = jnp.asarray([[10.0, 20.0, 110.0, 140.0]])
    centers, scales = box_to_center_scale(boxes)
    np.testing.assert_allclose(
        np.asarray(centers), [[60.0, 80.0 - 120.0 * 0.12]], rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(scales), [(100.0 + 120.0) / 195.0], rtol=1e-6)


def test_crop_faces_batched_center_identity():
    """A crop centered on the image with h=200*scale==image size reproduces
    a bilinear resize of the image."""
    img = (RNG.rand(1, 200, 200, 3) * 255).astype(np.float32)
    centers = jnp.asarray([[100.0, 100.0]])
    scales = jnp.asarray([1.0])  # h = 200 -> crop ~ the full image
    out = np.asarray(crop_faces_batched(jnp.asarray(img), centers, scales, 256))
    assert out.shape == (1, 256, 256, 3)
    assert out.min() >= 0 and out.max() <= 1.0
    # centers of image should match a direct bilinear upsample
    from s2v_tpu.ops.image import resize_bilinear

    want = np.asarray(resize_bilinear(jnp.asarray(img), (256, 256)))[0] / 255.0
    diff = np.abs(out[0, 8:-8, 8:-8] - want[8:-8, 8:-8])
    assert diff.max() < 0.02, diff.max()
