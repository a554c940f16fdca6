"""GPEN parity vs the reference torch implementation (gpen_model.py imported
with its own CPU fallbacks for the fused/upfirdn ops)."""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from s2v_tpu.models.gpen import (
    Discriminator,
    FullGenerator,
    FullGeneratorSR,
    upsample2,
    downsample2,
)
from s2v_tpu.utils.weights import convert_gpen_full

RNG = np.random.RandomState(88)

GPEN_DIR = "/root/reference/third_part/GPEN/face_model"


def load_ref_gpen():
    if GPEN_DIR not in sys.path:
        sys.path.insert(0, GPEN_DIR)
    import gpen_model  # noqa: F401

    return gpen_model


def test_full_generator_parity():
    gm = load_ref_gpen()
    torch.manual_seed(13)
    ref = gm.FullGenerator(size=64, style_dim=64, n_mlp=2,
                           channel_multiplier=1, narrow=0.5).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_gpen_full(sd, size=64, n_mlp=2)

    model = FullGenerator(size=64, style_dim=64, n_mlp=2,
                          channel_multiplier=1, narrow=0.5)
    x = (RNG.rand(2, 64, 64, 3).astype(np.float32) - 0.5) * 2
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
    got = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x),
        deterministic=True,
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.numpy().shape
    np.testing.assert_allclose(got, want.numpy(), rtol=0, atol=5e-3)


def test_full_generator_sr_parity():
    gm = load_ref_gpen()
    torch.manual_seed(14)
    ref = gm.FullGenerator_SR(in_size=32, out_size=64, style_dim=64, n_mlp=2,
                              channel_multiplier=1, narrow=0.5).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_gpen_full(sd, size=64, n_mlp=2, in_size=32)

    model = FullGeneratorSR(in_size=32, out_size=64, style_dim=64, n_mlp=2,
                            channel_multiplier=1, narrow=0.5)
    x = (RNG.rand(1, 32, 32, 3).astype(np.float32) - 0.5) * 2
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
    got = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x),
        deterministic=True,
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.numpy().shape
    np.testing.assert_allclose(got, want.numpy(), rtol=0, atol=5e-3)


def test_upsample_downsample_match_reference():
    gm = load_ref_gpen()
    x = RNG.randn(2, 4, 16, 16).astype(np.float32)
    up = gm.Upsample([1, 3, 3, 1])
    down = gm.Downsample([1, 3, 3, 1])
    with torch.no_grad():
        want_up = up(torch.from_numpy(x)).numpy()
        want_down = down(torch.from_numpy(x)).numpy()
    got_up = np.asarray(upsample2(jnp.asarray(x.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    got_down = np.asarray(downsample2(jnp.asarray(x.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_up, want_up, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_down, want_down, rtol=1e-4, atol=1e-4)


def test_discriminator_shapes():
    model = Discriminator(size=64, channel_multiplier=1, narrow=0.5)
    x = jnp.zeros((4, 64, 64, 3))
    var = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(var, x)
    assert out.shape == (4, 1)
