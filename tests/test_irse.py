"""IR-SE50 identity backbone parity vs the reference GPEN module
(training/loss/model_irse.py), plus the IDLoss crop/pool path."""

import importlib.util
import sys

import numpy as np
import torch

import jax
import jax.numpy as jnp

from s2v_tpu.models.irse import BackboneIRSE, id_loss, id_loss_feats
from s2v_tpu.utils.weights import conversion_coverage, convert_irse

RNG = np.random.RandomState(271)
LOSS_DIR = "/root/reference/third_part/GPEN/training/loss"


def load_ref_backbone():
    if LOSS_DIR not in sys.path:
        sys.path.insert(0, LOSS_DIR)
    spec = importlib.util.spec_from_file_location(
        "ref_model_irse", f"{LOSS_DIR}/model_irse.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_irse50_parity_and_id_loss():
    mod = load_ref_backbone()
    torch.manual_seed(41)
    ref = mod.Backbone(input_size=112, num_layers=50, drop_ratio=0.6,
                       mode="ir_se").eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()
          if "num_batches_tracked" not in k}
    variables, leftover = conversion_coverage(convert_irse, sd)
    assert leftover == []
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    x = RNG.rand(2, 112, 112, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        want = ref(torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2)))).numpy()
    got = np.asarray(BackboneIRSE().apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)

    # IDLoss.extract_feats crop + adaptive pool (id_loss.py:18-25)
    imgs = jnp.asarray(RNG.rand(2, 256, 256, 3).astype(np.float32))
    feats = id_loss_feats(variables, imgs)
    assert feats.shape == (2, 512)
    # identical inputs -> zero loss; different -> positive
    assert float(id_loss(variables, imgs, imgs)) < 1e-5
    other = jnp.asarray(RNG.rand(2, 256, 256, 3).astype(np.float32))
    assert float(id_loss(variables, imgs, other)) > 0


def test_id_loss_crop_matches_torch_adaptive_pool():
    """The matmul adaptive pool == torch AdaptiveAvgPool2d on the crop."""
    from s2v_tpu.models.irse import _adaptive_avg_matrix

    x = RNG.rand(1, 188, 188, 4).astype(np.float32)
    my = _adaptive_avg_matrix(188, 112)
    got = np.einsum("ow,bhwc->bhoc", my,
                    np.einsum("oh,bhwc->bowc", my, x))
    want = torch.nn.functional.adaptive_avg_pool2d(
        torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))),
        (112, 112)).numpy()
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=0, atol=1e-5)


def test_mobilefacenet_parity():
    """MobileFaceNet vs the reference arcface backbone."""
    from s2v_tpu.models.iresnet import MobileFaceNet
    from s2v_tpu.utils.weights import convert_mobilefacenet

    spec = importlib.util.spec_from_file_location(
        "ref_mfn",
        "/root/reference/third_part/face3d/models/arcface_torch/backbones/"
        "mobilefacenet.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch.manual_seed(43)
    ref = mod.MobileFaceNet().eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()
          if "num_batches_tracked" not in k}
    variables, leftover = conversion_coverage(convert_mobilefacenet, sd)
    assert leftover == []
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    x = RNG.rand(2, 112, 112, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        want = ref(torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2)))).numpy()
    got = np.asarray(MobileFaceNet().apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)


def test_get_model_registry():
    from s2v_tpu.models.iresnet import IResNet, MobileFaceNet, get_model

    assert isinstance(get_model("mbf"), MobileFaceNet)
    for name, want in [("r18", (2, 2, 2, 2)), ("r100", (3, 13, 30, 3)),
                       ("r2060", (3, 128, 896, 3))]:
        m = get_model(name)
        assert isinstance(m, IResNet) and tuple(m.layers) == want
    import pytest

    with pytest.raises(ValueError):
        get_model("vit")


def test_resnet_depth_parity():
    """ResNetDepth vs face_detection/models.py (3D-landmark depth net)."""
    from s2v_tpu.models.resnet import ResNetDepth
    from s2v_tpu.utils.weights import conversion_coverage, convert_resnet_depth

    spec = importlib.util.spec_from_file_location(
        "ref_fan_models", "/root/reference/third_part/face_detection/models.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch.manual_seed(47)
    ref = mod.ResNetDepth().eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()
          if "num_batches_tracked" not in k}
    variables, leftover = conversion_coverage(convert_resnet_depth, sd)
    assert leftover == []
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    # 224^2: final map 7x7 so the fixed (non-adaptive) AvgPool2d(7) covers it
    x = RNG.rand(1, 224, 224, 71).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2)))).numpy()
    got = np.asarray(ResNetDepth().apply(variables, jnp.asarray(x)))
    # random-init 152-layer magnitudes reach 1e8 -> compare relatively
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1.0)
