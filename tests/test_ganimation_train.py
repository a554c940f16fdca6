"""GANimation training losses with a tiny generator/discriminator pair."""

import numpy as np

import jax
import jax.numpy as jnp

from s2v_tpu.models.ganimation import SplitGenerator
from s2v_tpu.train.ganimation_train import (
    ganimation_d_loss,
    ganimation_g_loss,
    tv_loss,
    wgan_gradient_penalty,
)

RNG = np.random.RandomState(261)


def tiny_models():
    gen = SplitGenerator(ngf=8, n_blocks=1)
    g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                      jnp.zeros((1, 17)))

    def gen_apply(params, img, aus):
        return gen.apply(params, img, aus)

    def disc_apply(params, x):
        # trivial differentiable critic: linear score + aus head
        score = jnp.sum(x * params["w"], axis=(1, 2, 3), keepdims=False)[:, None]
        aus = jnp.mean(x, axis=(1, 2)) @ params["wa"]
        return score, aus

    d_params = {
        "w": jnp.asarray(RNG.randn(1, 32, 32, 3).astype(np.float32) * 0.01),
        "wa": jnp.asarray(RNG.randn(3, 17).astype(np.float32) * 0.1),
    }
    return gen_apply, g_vars, disc_apply, d_params


def test_tv_loss_zero_for_constant():
    assert float(tv_loss(jnp.ones((1, 8, 8, 1)))) == 0.0
    assert float(tv_loss(jnp.asarray(RNG.rand(1, 8, 8, 1)))) > 0


def test_gradient_penalty_near_zero_for_unit_gradient_critic():
    def disc_apply(params, x):
        # D(x) = sum over a unit direction -> grad norm == 1 everywhere
        return jnp.sum(x * params, axis=(1, 2, 3))[:, None], None

    d = jnp.zeros((1, 8, 8, 3)).at[0, 0, 0, 0].set(1.0)
    real = jnp.asarray(RNG.rand(4, 8, 8, 3).astype(np.float32))
    fake = jnp.asarray(RNG.rand(4, 8, 8, 3).astype(np.float32))
    gp = float(wgan_gradient_penalty(disc_apply, d, real, fake,
                                     jax.random.PRNGKey(0)))
    assert gp < 1e-6


def test_d_and_g_losses_finite_and_differentiable():
    gen_apply, g_vars, disc_apply, d_params = tiny_models()
    src = jnp.asarray(RNG.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    src_aus = jnp.asarray(RNG.rand(2, 17).astype(np.float32))
    tar_aus = jnp.asarray(RNG.rand(2, 17).astype(np.float32))

    d_loss, dm = ganimation_d_loss(
        disc_apply, d_params, gen_apply, g_vars, src, src_aus, tar_aus,
        jax.random.PRNGKey(1),
    )
    assert np.isfinite(float(d_loss))
    gd = jax.grad(lambda p: ganimation_d_loss(
        disc_apply, p, gen_apply, g_vars, src, src_aus, tar_aus,
        jax.random.PRNGKey(1))[0])(d_params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(gd))

    g_loss, gm = ganimation_g_loss(
        gen_apply, g_vars, disc_apply, d_params, src, src_aus, tar_aus
    )
    assert np.isfinite(float(g_loss))
    assert gm["g_rec"] > 0


def test_stargan_losses_and_trainer_steps():
    from s2v_tpu.train.ganimation_train import (
        make_expression_trainer,
        stargan_d_loss,
        stargan_g_loss,
    )

    gen_apply, g_vars, disc_apply, d_params = tiny_models()
    src = jnp.asarray(RNG.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    src_aus = jnp.asarray(RNG.rand(2, 17).astype(np.float32))
    tar_aus = jnp.asarray(RNG.rand(2, 17).astype(np.float32))
    rng = jax.random.PRNGKey(3)

    dl, dm = stargan_d_loss(disc_apply, d_params, gen_apply, g_vars,
                            src, src_aus, tar_aus, rng)
    gl, gm = stargan_g_loss(gen_apply, g_vars, disc_apply, d_params,
                            src, src_aus, tar_aus)
    assert np.isfinite(float(dl)) and np.isfinite(float(gl))
    assert "g_mask" not in gm  # stargan has no attention losses

    for model in ("stargan", "ganimation"):
        state, d_step, g_step = make_expression_trainer(
            gen_apply, disc_apply, g_vars, d_params, model=model)
        before = [np.asarray(l) for l in jax.tree_util.tree_leaves(state["g"])]
        state, dm = d_step(state, src, src_aus, tar_aus, rng)
        state, gm = g_step(state, src, src_aus, tar_aus)
        after = jax.tree_util.tree_leaves(state["g"])
        assert np.isfinite(float(gm["g_total"]))
        assert np.isfinite(float(dm["d_total"]))
        # stargan leaves the (unused) attention head untouched, so check
        # that SOME generator leaves moved
        assert any(not np.allclose(b, np.asarray(a))
                   for b, a in zip(before, after))
