"""Structural tests for DNet / LNet / ENet: shapes, jit-compilability,
determinism, and gradient-freeze behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2v_tpu.models import DNet, ENet, LNet
from s2v_tpu.models.lnet import AudioEncoder, VisualEncoder


def n_params(params):
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


def test_audio_encoder_shape(rng):
    mel = jnp.zeros((2, 80, 16, 1))
    model = AudioEncoder()
    var = model.init(rng, mel)
    out = model.apply(var, mel)
    assert out.shape == (2, 512)


def test_visual_encoder_shapes(rng):
    inp = jnp.zeros((2, 96, 96, 3))
    model = VisualEncoder()
    var = model.init(rng, inp, inp)
    outs = model.apply(var, inp, inp)
    shapes = [o.shape for o in outs]
    assert shapes == [
        (2, 96, 96, 64), (2, 48, 48, 128), (2, 24, 24, 256), (2, 12, 12, 1024),
    ]


def test_lnet_forward_jit(rng):
    mel = jnp.zeros((2, 80, 16, 1))
    face = jnp.zeros((2, 96, 96, 6))
    # slim graph: full geometry is covered by test_weight_parity
    model = LNet(num_res_blocks=2, base_nc=8, max_nc=32)
    var = model.init(rng, mel, face)
    out = jax.jit(lambda v, a, f: model.apply(v, a, f))(var, mel, face)
    assert out.shape == (2, 96, 96, 3)
    out_np = np.asarray(out)
    assert np.isfinite(out_np).all()
    assert (out_np >= 0).all() and (out_np <= 1).all()  # sigmoid output


def test_dnet_forward_jit(rng):
    img = jnp.zeros((2, 256, 256, 3))
    coeff = jnp.zeros((2, 27, 73))
    # slim widths: full geometry is covered by test_weight_parity
    model = DNet(descriptor_nc=16, warp_base_nc=8, edit_base_nc=8, max_nc=32)
    var = model.init(rng, img, coeff)
    out = jax.jit(lambda v, i, c: model.apply(v, i, c))(var, img, coeff)
    assert out["flow_field"].shape == (2, 64, 64, 2)
    assert out["warp_image"].shape == (2, 256, 256, 3)
    assert out["fake_image"].shape == (2, 256, 256, 3)
    fake = np.asarray(out["fake_image"])
    assert np.isfinite(fake).all()
    assert (fake >= -1).all() and (fake <= 1).all()  # tanh output


@pytest.mark.slow
def test_enet_forward_jit(rng):
    mel = jnp.zeros((1, 80, 16, 1))
    face = jnp.zeros((1, 384, 384, 6))
    gt = jnp.zeros((1, 384, 384, 3))
    # slim widths: full geometry is covered by test_weight_parity (still
    # slow-marked: the 384^2 style convs dominate regardless of width)
    model = ENet(lnet_res_blocks=2, channel_multiplier=0.25, narrow=0.25,
                 lnet_base_nc=8, lnet_max_nc=32)
    var = model.init(rng, mel, face, gt)
    pred, low_res = jax.jit(lambda v, a, f, g: model.apply(v, a, f, g))(
        var, mel, face, gt
    )
    assert pred.shape == (1, 384, 384, 3)
    assert low_res.shape == (1, 96, 96, 3)
    assert np.isfinite(np.asarray(pred)).all()


@pytest.mark.slow
def test_enet_lnet_frozen(rng):
    """ENet.py:18-19 freezes LNet — grads through pred must not reach
    low_res params."""
    mel = jnp.zeros((1, 80, 16, 1))
    face = jnp.ones((1, 384, 384, 6)) * 0.5
    gt = jnp.ones((1, 384, 384, 3)) * 0.5
    model = ENet(lnet_res_blocks=2, channel_multiplier=0.25, narrow=0.25,
                 lnet_base_nc=8, lnet_max_nc=32)
    var = model.init(rng, mel, face, gt)

    def loss_fn(params):
        pred, _ = model.apply(
            {"params": params, "batch_stats": var.get("batch_stats", {})},
            mel, face, gt,
        )
        return jnp.sum(pred ** 2)

    grads = jax.grad(loss_fn)(var["params"])
    lnet_grad = jax.tree_util.tree_leaves(grads["low_res"])
    assert all(float(jnp.abs(g).max()) == 0.0 for g in lnet_grad)
    style_grad = jax.tree_util.tree_leaves(grads["style_encoder"])
    assert any(float(jnp.abs(g).max()) > 0.0 for g in style_grad)


def test_lnet_param_count_plausible(rng):
    model = LNet()
    var = model.init(rng, jnp.zeros((1, 80, 16, 1)), jnp.zeros((1, 96, 96, 6)))
    n = n_params(var["params"])
    # LNet is a ~30-80M parameter generator; catch gross wiring errors.
    assert 10e6 < n < 200e6, n
