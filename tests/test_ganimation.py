"""GANimation SplitGenerator parity vs the reference torch module."""

import importlib.util
import sys

import numpy as np
import torch

import jax
import jax.numpy as jnp

from s2v_tpu.models.ganimation import SplitGenerator, apply_expression
from s2v_tpu.utils.weights import convert_ganimation

RNG = np.random.RandomState(131)


def load_ref():
    spec = importlib.util.spec_from_file_location(
        "ref_ganimation_utils",
        "/root/reference/third_part/ganimation_replicate/model/model_utils.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_split_generator_parity():
    mu = load_ref()
    torch.manual_seed(41)
    import functools
    import torch.nn as nn

    norm_layer = functools.partial(nn.InstanceNorm2d, affine=False,
                                   track_running_stats=False)
    ref = mu.SplitGenerator(3, 17, ngf=16, norm_layer=norm_layer,
                            use_dropout=False, n_blocks=3,
                            padding_type="zero").eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_ganimation(sd, n_blocks=3)

    model = SplitGenerator(ngf=16, n_blocks=3)
    img = (RNG.rand(2, 64, 64, 3).astype(np.float32) - 0.5) * 2
    aus = RNG.rand(2, 17).astype(np.float32)
    with torch.no_grad():
        want_color, want_att, _ = ref(
            torch.from_numpy(np.ascontiguousarray(img.transpose(0, 3, 1, 2))),
            torch.from_numpy(aus),
        )
    got_color, got_att, _ = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(img), jnp.asarray(aus),
    )
    np.testing.assert_allclose(
        np.asarray(got_color).transpose(0, 3, 1, 2), want_color.numpy(),
        rtol=0, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(got_att).transpose(0, 3, 1, 2), want_att.numpy(),
        rtol=0, atol=2e-3,
    )
    out = apply_expression(jnp.asarray(img), got_color, got_att)
    assert out.shape == img.shape
