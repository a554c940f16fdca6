"""ReconNet (Deep3DFaceRecon ResNet50) parity vs the reference torch model
and align_img/POS geometry checks."""

import sys
import types

import numpy as np
import torch
from PIL import Image

import jax
import jax.numpy as jnp

from s2v_tpu.models.resnet import ReconNet
from s2v_tpu.pipeline.face3d_prep import POS, align_img, extract_5p, umeyama
from s2v_tpu.utils.weights import convert_recon_net

RNG = np.random.RandomState(55)


def load_ref_networks():
    if "kornia" not in sys.modules:
        kornia = types.ModuleType("kornia")
        geometry = types.ModuleType("kornia.geometry")
        geometry.warp_affine = lambda *a, **k: None
        kornia.geometry = geometry
        sys.modules["kornia"] = kornia
        sys.modules["kornia.geometry"] = geometry
    if "/root/reference/third_part" not in sys.path:
        sys.path.insert(0, "/root/reference/third_part")
    from face3d.models import networks

    return networks


def test_recon_net_parity():
    networks = load_ref_networks()
    torch.manual_seed(7)
    ref = networks.ReconNetWrapper("resnet50", use_last_fc=False).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_recon_net(sd)

    x = RNG.rand(2, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(
        ReconNet().apply(jax.tree_util.tree_map(jnp.asarray, variables),
                         jnp.asarray(x))
    )
    assert got.shape == want.shape == (2, 257)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-3)


def test_pos_recovers_similarity():
    """POS on points produced by a known similarity recovers (t, s)."""
    x3d = RNG.randn(3, 5)
    s_true, tx, ty = 2.5, 30.0, -12.0
    xp = np.stack([s_true * x3d[0] + tx, s_true * x3d[1] + ty])
    t, s = POS(xp, x3d)
    # POS solves a general linear map; for in-plane points the scale matches
    np.testing.assert_allclose(s, s_true, rtol=1e-6)
    np.testing.assert_allclose(t.ravel(), [tx, ty], rtol=1e-6, atol=1e-6)


def test_extract_5p_shape():
    lm = RNG.rand(68, 2)
    p5 = extract_5p(lm)
    assert p5.shape == (5, 2)


def test_align_img_geometry():
    img = Image.fromarray((RNG.rand(256, 256, 3) * 255).astype(np.uint8))
    lm = RNG.rand(68, 2) * 200 + 28
    lm3d = RNG.randn(5, 3)
    trans, img_new, lm_new = align_img(img, lm, lm3d)
    assert img_new.size == (224, 224)
    assert trans.shape == (5,)
    assert lm_new.shape == (68, 2)


def test_umeyama_matches_known_similarity():
    src = RNG.rand(5, 2) * 100
    theta, scale, t = 0.3, 1.7, np.array([5.0, -3.0])
    rot = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    dst = scale * src @ rot.T + t
    m = umeyama(src, dst, True)
    got = (m[:2, :2] @ src.T).T + m[:2, 2]
    np.testing.assert_allclose(got, dst, rtol=1e-6, atol=1e-6)
