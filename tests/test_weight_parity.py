"""Numerical parity: s2v_tpu models with converted weights vs the reference
PyTorch models (imported read-only from /root/reference as a test oracle).

For each model we build the torch module with its own random init, export its
state_dict, convert with s2v_tpu.utils.weights, and compare forward outputs
on the same inputs. This validates both the converter name mapping and every
op's torch-semantics fidelity end-to-end through the full graphs.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# ---- import the reference models with stubs for deps absent in this image --
REF = "/root/reference"


def _install_stubs():
    if "basicsr" not in sys.modules:
        basicsr = types.ModuleType("basicsr")
        archs = types.ModuleType("basicsr.archs")
        arch_util = types.ModuleType("basicsr.archs.arch_util")

        def default_init_weights(module_list, scale=1, bias_fill=0, **kwargs):
            import torch.nn as nn

            if not isinstance(module_list, list):
                module_list = [module_list]
            for module in module_list:
                for m in module.modules() if hasattr(module, "modules") else [module]:
                    if isinstance(m, (nn.Conv2d, nn.Linear)):
                        if m.bias is not None:
                            m.bias.data.fill_(bias_fill)

        arch_util.default_init_weights = default_init_weights
        archs.arch_util = arch_util
        basicsr.archs = archs
        sys.modules["basicsr"] = basicsr
        sys.modules["basicsr.archs"] = archs
        sys.modules["basicsr.archs.arch_util"] = arch_util
    if "torchsummary" not in sys.modules:
        ts = types.ModuleType("torchsummary")
        ts.summary = lambda *a, **k: None
        sys.modules["torchsummary"] = ts
    if REF not in sys.path:
        sys.path.insert(0, REF)


_install_stubs()

import torch  # noqa: E402

torch.manual_seed(0)

from models.LNet import LNet as RefLNet  # noqa: E402
from models.ENet import ENet as RefENet  # noqa: E402
from models.DNet import DNet as RefDNet  # noqa: E402

from s2v_tpu.models import DNet, ENet, LNet  # noqa: E402
from s2v_tpu.utils.weights import convert_dnet, convert_enet, convert_lnet  # noqa: E402

RNG = np.random.RandomState(11)


def to_sd(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def assert_tree_shapes_match(converted, expected, path=""):
    """Every leaf of the init tree must exist in the converted tree with the
    same shape (and vice versa)."""
    ck = set(converted.keys())
    ek = set(expected.keys())
    assert ck == ek, f"{path}: keys differ: extra={ck - ek}, missing={ek - ck}"
    for k in ek:
        c, e = converted[k], expected[k]
        if isinstance(e, dict):
            assert_tree_shapes_match(c, e, f"{path}/{k}")
        else:
            assert tuple(np.shape(c)) == tuple(e.shape), (
                f"{path}/{k}: {np.shape(c)} vs {e.shape}"
            )


@pytest.mark.parity
def test_lnet_parity():
    torch.manual_seed(0)
    ref = RefLNet().eval()
    sd = to_sd(ref)
    variables = convert_lnet(sd)

    model = LNet()
    audio = RNG.randn(2, 1, 80, 16).astype(np.float32)
    face = RNG.rand(2, 6, 96, 96).astype(np.float32)

    # structural check against init shapes
    init_shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 80, 16, 1)), jnp.zeros((1, 96, 96, 6)),
    )
    assert_tree_shapes_match(variables["params"], init_shapes["params"])

    with torch.no_grad():
        want = ref(torch.from_numpy(audio), torch.from_numpy(face)).numpy()

    got = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(audio.transpose(0, 2, 3, 1)),
        jnp.asarray(face.transpose(0, 2, 3, 1)),
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-3)


@pytest.mark.parity
def test_dnet_parity():
    torch.manual_seed(1)
    ref = RefDNet().eval()
    sd = to_sd(ref)
    variables = convert_dnet(sd)

    model = DNet()
    img = (RNG.rand(2, 3, 256, 256).astype(np.float32) * 2 - 1)
    coeff = RNG.randn(2, 73, 27).astype(np.float32) * 0.1

    init_shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 256, 256, 3)), jnp.zeros((1, 27, 73)),
    )
    assert_tree_shapes_match(variables["params"], init_shapes["params"])

    with torch.no_grad():
        want = ref(torch.from_numpy(img), torch.from_numpy(coeff))

    got = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(coeff.transpose(0, 2, 1)),
    )
    for key in ("flow_field", "warp_image", "fake_image"):
        g = np.asarray(got[key]).transpose(0, 3, 1, 2)
        w = want[key].numpy()
        assert g.shape == w.shape, key
        np.testing.assert_allclose(g, w, rtol=0, atol=3e-3, err_msg=key)


@pytest.mark.parity
def test_enet_parity():
    torch.manual_seed(2)
    ref_lnet = RefLNet().eval()
    ref = RefENet(lnet=ref_lnet).eval()
    sd = to_sd(ref)
    lnet_sd = to_sd(ref_lnet)
    variables = convert_enet(sd, lnet_sd)

    model = ENet()
    audio = RNG.randn(1, 1, 80, 16).astype(np.float32)
    face = RNG.rand(1, 6, 384, 384).astype(np.float32)
    gt = RNG.rand(1, 3, 384, 384).astype(np.float32)

    init_shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 80, 16, 1)), jnp.zeros((1, 384, 384, 6)),
        jnp.zeros((1, 384, 384, 3)),
    )
    assert_tree_shapes_match(variables["params"], init_shapes["params"])

    with torch.no_grad():
        want_pred, want_low = ref(
            torch.from_numpy(audio), torch.from_numpy(face), torch.from_numpy(gt)
        )

    got_pred, got_low = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(audio.transpose(0, 2, 3, 1)),
        jnp.asarray(face.transpose(0, 2, 3, 1)),
        jnp.asarray(gt.transpose(0, 2, 3, 1)),
        deterministic=True,  # noise weight is zero-init, so noise is inert
    )
    np.testing.assert_allclose(
        np.asarray(got_low).transpose(0, 3, 1, 2), want_low.numpy(),
        rtol=0, atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(got_pred).transpose(0, 3, 1, 2), want_pred.numpy(),
        rtol=0, atol=5e-3,
    )
