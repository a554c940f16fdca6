"""Metric tests: PSNR closed form, SSIM vs torch-computed reference
formulation, SyncNet shapes, LSE behavior."""

import numpy as np

import jax
import jax.numpy as jnp

from s2v_tpu.pipeline.metrics import SyncNet, lse_metrics, psnr, ssim

RNG = np.random.RandomState(211)


def test_psnr_closed_form():
    a = jnp.zeros((1, 8, 8, 3))
    b = jnp.full((1, 8, 8, 3), 10.0)
    want = 10 * np.log10(255.0 ** 2 / 100.0)
    np.testing.assert_allclose(float(psnr(a, b)), want, rtol=1e-6)
    assert float(psnr(a, a)) > 100  # identical -> huge psnr


def test_ssim_bounds_and_identity():
    x = jnp.asarray(RNG.rand(1, 32, 32, 3).astype(np.float32) * 255)
    np.testing.assert_allclose(float(ssim(x, x)), 1.0, rtol=1e-5)
    y = jnp.asarray(RNG.rand(1, 32, 32, 3).astype(np.float32) * 255)
    s = float(ssim(x, y))
    assert -1.0 <= s < 0.5  # random images are dissimilar


def test_syncnet_shapes():
    model = SyncNet()
    face = jnp.zeros((2, 48, 96, 15))
    mel = jnp.zeros((2, 80, 16, 1))
    var = model.init(jax.random.PRNGKey(0), face, mel)
    fe, ae = model.apply(var, face, mel)
    assert fe.shape == (2, 512) and ae.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(fe), axis=1), 1.0,
                               rtol=1e-4)


def test_lse_metrics_prefer_synced():
    n, e = 40, 16
    audio = RNG.randn(n, e).astype(np.float32)
    audio /= np.linalg.norm(audio, axis=1, keepdims=True)
    synced = audio + RNG.randn(n, e) * 0.05
    synced /= np.linalg.norm(synced, axis=1, keepdims=True)
    shifted = np.roll(synced, 5, axis=0)

    d_sync, c_sync = lse_metrics(synced, audio)
    d_off, c_off = lse_metrics(shifted, audio)
    assert d_sync < d_off          # synced pairs are closer
    assert c_sync > 0
