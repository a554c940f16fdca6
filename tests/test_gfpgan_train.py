"""GFPGAN training components."""

import numpy as np

import jax
import jax.numpy as jnp

from s2v_tpu.train.gfpgan_train import (
    FacialComponentDiscriminator,
    component_style_loss,
    gram_mat,
    make_gfpgan_g_loss,
    roi_crop,
)

RNG = np.random.RandomState(251)


def test_component_discriminator_shapes():
    model = FacialComponentDiscriminator()
    x = jnp.zeros((2, 80, 80, 3))
    var = model.init(jax.random.PRNGKey(0), x)
    out, feats = model.apply(var, x, True)
    assert out.shape == (2, 20, 20, 1)
    assert len(feats) == 2
    assert feats[0].shape[1] == 40 and feats[1].shape[1] == 20


def test_roi_crop_fixed_windows():
    imgs = jnp.asarray(RNG.rand(3, 64, 64, 3).astype(np.float32))
    centers = jnp.asarray([[32.0, 32.0], [5.0, 5.0], [60.0, 62.0]])
    crops = roi_crop(imgs, centers, 16)
    assert crops.shape == (3, 16, 16, 3)
    np.testing.assert_allclose(
        np.asarray(crops[0]), np.asarray(imgs[0, 24:40, 24:40])
    )
    # clamped at borders
    np.testing.assert_allclose(np.asarray(crops[1]), np.asarray(imgs[1, :16, :16]))


def test_gram_and_style_loss():
    import torch

    x = RNG.rand(2, 8, 8, 4).astype(np.float32)
    got = np.asarray(gram_mat(jnp.asarray(x)))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    feat = xt.view(2, 4, 64)
    want = (feat.bmm(feat.transpose(1, 2)) / (4 * 8 * 8)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    f = [jnp.asarray(RNG.rand(1, 8, 8, 4).astype(np.float32))]
    assert float(component_style_loss(f, f)) < 1e-7


def test_g_loss_composes():
    comp = FacialComponentDiscriminator()
    cvar = comp.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))

    def comp_apply(params, x, return_feats):
        return comp.apply(params, x, return_feats)

    def disc_apply(params, x):  # trivial global D
        return jnp.mean(x, axis=(1, 2, 3), keepdims=False)[:, None]

    loss_fn = make_gfpgan_g_loss(
        disc_apply, {"mouth": (comp_apply, cvar)},
        vgg_loss_fn=lambda a, b: jnp.mean(jnp.abs(a - b)),
        id_embed_fn=lambda x: jnp.mean(x, axis=(1, 2)),
    )
    fake = jnp.asarray(RNG.rand(2, 32, 32, 3).astype(np.float32))
    real = jnp.asarray(RNG.rand(2, 32, 32, 3).astype(np.float32))
    rois = {"mouth": (fake[:, 8:24, 8:24], real[:, 8:24, 8:24])}
    loss, metrics = loss_fn(fake, real, None, rois)
    assert np.isfinite(float(loss))
    for k in ("pixel", "percep", "adv", "mouth_adv", "id", "g_total"):
        assert k in metrics
    # differentiable wrt fake
    g = jax.grad(lambda f: loss_fn(f, real, None,
                                   {"mouth": (f[:, 8:24, 8:24],
                                              real[:, 8:24, 8:24])})[0])(fake)
    assert np.isfinite(np.asarray(g)).all()


def test_gfpgan_trainer_steps():
    from s2v_tpu.train.gfpgan_train import make_gfpgan_trainer

    rng = jax.random.PRNGKey(3)
    comp = FacialComponentDiscriminator()
    size = 64

    def gen_apply(p, lq):  # trivial differentiable generator
        return jnp.tanh(lq * p["s"] + p["b"])

    def disc_apply(p, x):
        return jnp.sum(x * p, axis=(1, 2, 3))[:, None]

    cvars = {
        name: comp.init(rng, jnp.zeros((1, 16, 16, 3)))
        for name in ("mouth",)
    }

    def comp_apply(p, x, return_feats):
        return comp.apply(p, x, return_feats)

    g_params = {"s": jnp.ones(()), "b": jnp.zeros(())}
    d_params = jnp.full((1, size, size, 3), 0.01)
    state, g_step, d_step = make_gfpgan_trainer(
        gen_apply, disc_apply, comp_apply, g_params, d_params, cvars,
        vgg_loss_fn=lambda a, b: jnp.mean(jnp.abs(a - b)),
        roi_sizes={"mouth": 16},
    )
    batch = {
        "lq": jnp.asarray(RNG.rand(2, size, size, 3).astype(np.float32) * 2 - 1),
        "gt": jnp.asarray(RNG.rand(2, size, size, 3).astype(np.float32) * 2 - 1),
        "loc_mouth": jnp.asarray([[32.0, 40.0], [30.0, 44.0]]),
    }
    state, gm = g_step(state, batch)
    state, dm = d_step(state, batch)
    assert np.isfinite(float(gm["g_total"]))
    assert np.isfinite(float(dm["d_total"]))
    assert float(state["g"]["s"]) != 1.0  # generator updated
