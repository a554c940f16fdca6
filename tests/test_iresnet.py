"""IResNet parity vs the reference arcface backbone."""

import importlib.util

import numpy as np
import torch

import jax
import jax.numpy as jnp

from s2v_tpu.models.iresnet import IResNet
from s2v_tpu.utils.weights import convert_iresnet

RNG = np.random.RandomState(141)


def test_iresnet18_parity():
    spec = importlib.util.spec_from_file_location(
        "ref_iresnet",
        "/root/reference/third_part/face3d/models/arcface_torch/backbones/iresnet.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(51)
    ref = mod.iresnet18(False).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_iresnet(sd, layers=(2, 2, 2, 2))

    model = IResNet(layers=(2, 2, 2, 2))
    x = RNG.rand(2, 112, 112, 3).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))).numpy()
    got = np.asarray(
        model.apply(jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x))
    )
    assert got.shape == want.shape == (2, 512)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-3)
