"""Pallas kernel tests.

On the CPU test platform, pallas kernels run in interpret mode; the same
code compiles with Mosaic on TPU. Parity oracle: the reference repo's own
python fallbacks (GPEN op/upfirdn2d.py:162-200 upfirdn2d_native and
op/fused_act.py:93-96), executed in torch.
"""

import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from s2v_tpu.ops.pallas.fused_act import (
    fused_bias_leaky_relu,
    fused_bias_leaky_relu_ref,
)
from s2v_tpu.ops.pallas.upfirdn2d import upfirdn2d_pallas, upfirdn2d_ref

RNG = np.random.RandomState(9)


def ref_upfirdn2d_torch(x_nchw, kernel, up, down, pad):
    """Direct port of the reference python fallback semantics via torch."""
    inp = torch.from_numpy(x_nchw)
    k = torch.from_numpy(kernel)
    out = inp.permute(0, 2, 3, 1)
    _, in_h, in_w, minor = out.shape
    kh, kw = k.shape
    out = out.view(-1, in_h, 1, in_w, 1, minor)
    out = F.pad(out, [0, 0, 0, up - 1, 0, 0, 0, up - 1])
    out = out.view(-1, in_h * up, in_w * up, minor)
    out = F.pad(out, [0, 0, max(pad[0], 0), max(pad[1], 0),
                      max(pad[0], 0), max(pad[1], 0)])
    out = out[:, max(-pad[0], 0): out.shape[1] - max(-pad[1], 0),
              max(-pad[0], 0): out.shape[2] - max(-pad[1], 0), :]
    out = out.permute(0, 3, 1, 2)
    out = out.reshape([-1, 1, in_h * up + pad[0] + pad[1],
                       in_w * up + pad[0] + pad[1]])
    w = torch.flip(k, [0, 1]).view(1, 1, kh, kw)
    out = F.conv2d(out, w)
    out = out.reshape(-1, minor,
                      in_h * up + pad[0] + pad[1] - kh + 1,
                      in_w * up + pad[0] + pad[1] - kw + 1)
    return out[:, :, ::down, ::down].numpy()


def blur_kernel(taps):
    k = np.asarray(taps, np.float32)
    k = np.outer(k, k)
    return k / k.sum()


CASES = [
    # (up, down, pad, taps) — the StyleGAN2 use sites (gpen_model.py:37-99)
    (1, 1, (2, 1), [1, 3, 3, 1]),   # Blur before/after resample
    (2, 1, (2, 1), [1, 3, 3, 1]),   # Upsample (kernel scaled by up^2)
    (1, 2, (1, 1), [1, 3, 3, 1]),   # Downsample
    (1, 1, (1, 1), [1, 2, 1]),      # 3-tap blur
]


@pytest.mark.parametrize("up,down,pad,taps", CASES)
def test_upfirdn2d_ref_matches_reference_fallback(up, down, pad, taps):
    k = blur_kernel(taps)
    if up > 1:
        k = k * (up ** 2)
    x = RNG.randn(2, 6, 13, 11).astype(np.float32)  # NCHW for the oracle
    want = ref_upfirdn2d_torch(x, k, up, down, pad)
    got = np.asarray(
        upfirdn2d_ref(jnp.asarray(x.transpose(0, 2, 3, 1)), k, up, down, pad)
    ).transpose(0, 3, 1, 2)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("up,down,pad,taps", CASES)
def test_upfirdn2d_pallas_interpret_matches_ref(up, down, pad, taps, monkeypatch):
    """Run the Pallas kernel in interpret mode on CPU and compare to XLA."""
    from jax.experimental.pallas import tpu as pltpu

    k = blur_kernel(taps)
    x = RNG.randn(2, 16, 16, 8).astype(np.float32)
    want = np.asarray(upfirdn2d_ref(jnp.asarray(x), k, up, down, pad))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(upfirdn2d_pallas(jnp.asarray(x), k, up, down, pad))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_bias_leaky_relu_matches_reference():
    x = RNG.randn(2, 5, 7, 16).astype(np.float32)
    b = RNG.randn(16).astype(np.float32)
    want = 2 ** 0.5 * F.leaky_relu(
        torch.from_numpy(x.transpose(0, 3, 1, 2))
        + torch.from_numpy(b).view(1, -1, 1, 1),
        negative_slope=0.2,
    ).numpy().transpose(0, 2, 3, 1)

    got_ref = np.asarray(fused_bias_leaky_relu_ref(jnp.asarray(x), jnp.asarray(b)))
    np.testing.assert_allclose(got_ref, want, rtol=1e-5, atol=1e-5)

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_bias_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_bias_leaky_relu_grad():
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.asarray(RNG.randn(2, 4, 4, 8).astype(np.float32))
    b = jnp.asarray(RNG.randn(8).astype(np.float32))

    def loss_p(x, b):
        return jnp.sum(fused_bias_leaky_relu(x, b) ** 2)

    def loss_r(x, b):
        return jnp.sum(fused_bias_leaky_relu_ref(x, b) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gx, gb = jax.grad(loss_p, argnums=(0, 1))(x, b)
    rx, rb = jax.grad(loss_r, argnums=(0, 1))(x, b)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-4, atol=1e-4)
