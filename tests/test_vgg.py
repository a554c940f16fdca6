"""VGG16 perceptual loss parity vs a hand-built torch replica of
torchvision's vgg16.features (torchvision itself is absent)."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from s2v_tpu.models.vgg import (
    VGG16Features,
    convert_vgg16_features,
    vgg_perceptual_loss,
)

RNG = np.random.RandomState(181)


def torchvision_vgg16_features():
    """The exact `features` Sequential of torchvision vgg16 (first 23)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers = []
    in_ch = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            in_ch = v
    return nn.Sequential(*layers)


def test_vgg16_blocks_parity():
    torch.manual_seed(61)
    features = torchvision_vgg16_features().eval()
    sd = {f"features.{i}.{k}": p.detach().numpy()
          for i, m in enumerate(features)
          for k, p in getattr(m, "_parameters", {}).items() if p is not None}
    variables = convert_vgg16_features(sd)

    x = RNG.rand(1, 64, 64, 3).astype(np.float32)
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    wants = []
    h = xt
    with torch.no_grad():
        for i, m in enumerate(features):
            h = m(h)
            if i + 1 in (4, 9, 16, 23):
                wants.append(h.numpy())
            if i + 1 >= 23:
                break

    gots = VGG16Features().apply(
        jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x)
    )
    assert len(gots) == len(wants) == 4
    for g, w in zip(gots, wants):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w, rtol=0, atol=1e-3
        )


def test_perceptual_loss_runs_and_is_zero_for_identical():
    variables = VGG16Features().init(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 224, 224, 3)))
    x = jnp.asarray(RNG.rand(1, 96, 96, 3).astype(np.float32))
    assert float(vgg_perceptual_loss(variables, x, x)) == 0.0
    y = jnp.asarray(RNG.rand(1, 96, 96, 3).astype(np.float32))
    loss = float(vgg_perceptual_loss(variables, x, y, style_layers=(2,)))
    assert np.isfinite(loss) and loss > 0


def test_lpips_properties():
    from s2v_tpu.models.vgg import LPIPS_ENDS, VGG16Features, lpips_distance

    variables = VGG16Features(block_ends=LPIPS_ENDS).init(
        jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3))
    )
    lin = [jnp.ones((c,)) * 0.01 for c in (64, 128, 256, 512, 512)]
    x = jnp.asarray(RNG.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    y = jnp.asarray(RNG.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    d_same = lpips_distance(variables, lin, x, x)
    d_diff = lpips_distance(variables, lin, x, y)
    assert d_same.shape == (2,)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    assert (np.asarray(d_diff) > 0).all()
