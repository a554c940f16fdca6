"""GAN trainer tests on a tiny GPEN generator/discriminator pair, with DP
sharding on the CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2v_tpu.models.gpen import Discriminator, FullGenerator
from s2v_tpu.parallel.mesh import make_mesh
from s2v_tpu.train.gan import (
    d_logistic_loss,
    g_nonsaturating_loss,
    make_gan_trainer,
    smooth_l1,
)

RNG = np.random.RandomState(171)


def test_loss_functions_match_reference_formulas():
    import torch
    import torch.nn.functional as F

    real = RNG.randn(8, 1).astype(np.float32)
    fake = RNG.randn(8, 1).astype(np.float32)
    want_d = (F.softplus(-torch.from_numpy(real)).mean()
              + F.softplus(torch.from_numpy(fake)).mean()).item()
    got_d = float(d_logistic_loss(jnp.asarray(real), jnp.asarray(fake)))
    np.testing.assert_allclose(got_d, want_d, rtol=1e-5)

    want_g = F.softplus(-torch.from_numpy(fake)).mean().item()
    np.testing.assert_allclose(
        float(g_nonsaturating_loss(jnp.asarray(fake))), want_g, rtol=1e-5
    )

    a = RNG.randn(4, 8, 8, 3).astype(np.float32)
    b = RNG.randn(4, 8, 8, 3).astype(np.float32)
    want_l1 = F.smooth_l1_loss(torch.from_numpy(a), torch.from_numpy(b)).item()
    np.testing.assert_allclose(
        float(smooth_l1(jnp.asarray(a), jnp.asarray(b))), want_l1, rtol=1e-5
    )


@pytest.mark.slow
def test_gan_steps_run_and_update():
    size = 32
    gen = FullGenerator(size=size, style_dim=32, n_mlp=2,
                        channel_multiplier=1, narrow=0.25)
    disc = Discriminator(size=size, channel_multiplier=1, narrow=0.25)
    rng = jax.random.PRNGKey(0)
    g_vars = gen.init(rng, jnp.zeros((1, size, size, 3)))
    d_vars = disc.init(rng, jnp.zeros((1, size, size, 3)))

    mesh = make_mesh(data_parallel=8, model_parallel=1)
    state, d_step, g_step = make_gan_trainer(
        lambda p, x: gen.apply({"params": p}, x, deterministic=True),
        lambda p, x: disc.apply({"params": p}, x),
        g_vars["params"], d_vars["params"], mesh=mesh,
        d_reg_every=2,
    )
    # batches come from the GPEN degradation pipeline (dataset_face.py
    # FaceDataset equivalent) — the trainer consumes dict(lq, hq) in [-1,1]
    from s2v_tpu.prep.degradations import face_batches

    hq_imgs = (RNG.rand(4, size, size, 3) * 255).astype(np.uint8)
    batch = {k: jnp.asarray(v) for k, v in next(face_batches(
        hq_imgs, batch_size=8, rng=np.random.default_rng(7),
        steps=1)).items()}
    with mesh:
        state, dm = d_step(state, batch)
        state, gm = g_step(state, batch)
        state, dm2 = d_step(state, batch)  # step 1: no r1 (1 % 2 != 0)
    assert np.isfinite(float(dm["d_loss"]))
    assert np.isfinite(float(gm["g_loss"]))
    assert float(dm["r1"]) >= 0  # step 0 runs the r1 branch
    assert float(dm2["r1"]) == 0.0
    assert int(state.step) == 1
