"""face3d training losses vs the reference torch formulas."""

import numpy as np
import torch

import jax.numpy as jnp

from s2v_tpu.train.face3d_losses import (
    landmark_loss,
    perceptual_loss,
    photo_loss,
    reflectance_loss,
    reg_loss,
)

RNG = np.random.RandomState(231)


def test_photo_loss_matches_torch():
    a = RNG.rand(2, 16, 16, 3).astype(np.float32)
    b = RNG.rand(2, 16, 16, 3).astype(np.float32)
    m = (RNG.rand(2, 16, 16, 1) > 0.3).astype(np.float32)
    ta = torch.from_numpy(a.transpose(0, 3, 1, 2))
    tb = torch.from_numpy(b.transpose(0, 3, 1, 2))
    tm = torch.from_numpy(m.transpose(0, 3, 1, 2))
    want = (torch.sqrt(1e-6 + torch.sum((ta - tb) ** 2, dim=1, keepdims=True)) * tm)
    want = (want.sum() / torch.clamp(tm.sum(), min=1.0)).item()
    got = float(photo_loss(jnp.asarray(a), jnp.asarray(b), jnp.asarray(m)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_landmark_loss_weighting():
    pred = RNG.rand(2, 68, 2).astype(np.float32)
    gt = RNG.rand(2, 68, 2).astype(np.float32)
    w = np.ones([68]); w[28:31] = 20; w[-8:] = 20
    want = (np.sum((pred - gt) ** 2, -1) * w[None]).sum() / (2 * 68)
    got = float(landmark_loss(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_reg_and_reflectance_and_perceptual():
    coeffs = {
        "id": jnp.asarray(RNG.randn(2, 80).astype(np.float32)),
        "exp": jnp.asarray(RNG.randn(2, 64).astype(np.float32)),
        "tex": jnp.asarray(RNG.randn(2, 80).astype(np.float32)),
        "gamma": jnp.asarray(RNG.randn(2, 27).astype(np.float32)),
    }
    creg, gamma = reg_loss(coeffs)
    want_creg = (np.sum(np.asarray(coeffs["id"]) ** 2)
                 + np.sum(np.asarray(coeffs["exp"]) ** 2)
                 + np.sum(np.asarray(coeffs["tex"]) ** 2)) / 2
    np.testing.assert_allclose(float(creg), want_creg, rtol=1e-5)
    assert float(gamma) > 0

    tex = jnp.asarray(RNG.rand(2, 30, 3).astype(np.float32))
    mask = jnp.asarray((RNG.rand(30) > 0.5).astype(np.float32))
    assert float(reflectance_loss(tex, mask)) > 0

    f = RNG.randn(4, 16).astype(np.float32)
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    assert float(perceptual_loss(jnp.asarray(f), jnp.asarray(f))) < 1e-5
