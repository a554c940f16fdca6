"""RetinaFace: FPN/SSH parity vs reference net.py (torchvision stubbed),
prior/decode parity vs the reference loops, full-graph shape test."""

import importlib.util
import math
import sys
import types

import numpy as np
import torch

import jax
import jax.numpy as jnp

from s2v_tpu.models.retinaface import (
    FPN,
    SSH,
    RetinaFace,
    decode_boxes,
    detect_faces,
    prior_box,
)
from s2v_tpu.utils.weights import SDView, _convbn, _split_stats

RNG = np.random.RandomState(101)


def load_ref_net():
    for name in ("torchvision", "torchvision.models", "torchvision.models._utils",
                 "torchvision.models.detection",
                 "torchvision.models.detection.backbone_utils"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    spec = importlib.util.spec_from_file_location(
        "ref_retina_net", "/root/reference/third_part/GPEN/face_detect/facemodels/net.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _convert_convbn_seq(sd, prefix):
    v = SDView(sd, prefix)
    return _convbn(v)


def test_ssh_parity():
    torch.manual_seed(31)
    net = load_ref_net()
    ref = net.SSH(64, 64).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    tree = {
        name: _convert_convbn_seq(sd, f"{name}.")
        for name in ("conv3X3", "conv5X5_1", "conv5X5_2", "conv7X7_2", "conv7x7_3")
    }
    params, stats = _split_stats(tree)
    x = RNG.randn(2, 16, 16, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))).numpy()
    got = SSH(64).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=0, atol=1e-4
    )


def test_fpn_parity():
    torch.manual_seed(32)
    net = load_ref_net()
    ref = net.FPN([64, 128, 256], 64).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    tree = {
        name: _convert_convbn_seq(sd, f"{name}.")
        for name in ("output1", "output2", "output3", "merge1", "merge2")
    }
    params, stats = _split_stats(tree)
    feats = [
        RNG.randn(1, 32, 32, 64).astype(np.float32),
        RNG.randn(1, 16, 16, 128).astype(np.float32),
        RNG.randn(1, 8, 8, 256).astype(np.float32),
    ]
    with torch.no_grad():
        want = ref({i: torch.from_numpy(np.ascontiguousarray(f.transpose(0, 3, 1, 2)))
                    for i, f in enumerate(feats)})
    got = FPN(64).apply(
        {"params": params, "batch_stats": stats},
        [jnp.asarray(f) for f in feats],
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w.numpy(), rtol=0, atol=1e-4
        )


def test_priorbox_matches_reference_loop():
    h, w = 96, 64
    # reference loop (prior_box.py:17-31)
    anchors = []
    min_sizes_cfg = [[16, 32], [64, 128], [256, 512]]
    steps = [8, 16, 32]
    for k, step in enumerate(steps):
        fh, fw = math.ceil(h / step), math.ceil(w / step)
        for i in range(fh):
            for j in range(fw):
                for min_size in min_sizes_cfg[k]:
                    anchors.append([
                        (j + 0.5) * step / w, (i + 0.5) * step / h,
                        min_size / w, min_size / h,
                    ])
    want = np.asarray(anchors, np.float32)
    got = prior_box((h, w))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_retinaface_forward_and_detect():
    model = RetinaFace()
    x = jnp.zeros((1, 64, 64, 3))
    var = model.init(jax.random.PRNGKey(0), x)
    loc, conf, ldm = model.apply(var, x)
    n = sum(
        math.ceil(64 / s) ** 2 * 2 for s in (8, 16, 32)
    )
    assert loc.shape == (1, n, 4)
    assert conf.shape == (1, n, 2)
    assert ldm.shape == (1, n, 10)
    np.testing.assert_allclose(np.asarray(conf.sum(-1)), 1.0, rtol=1e-5)
    boxes, landms, valid = detect_faces((loc, conf, ldm), (64, 64))
    assert boxes.shape == (1, 4) and landms.shape == (1, 5, 2)


def test_retinaface_mnet_parity():
    """cfg_mnet full-model parity: reference MobileNetV1 + FPN + SSH + heads
    (retinaface.py:48-140 with config.py cfg_mnet) vs retinaface_mnet()."""
    import torch.nn as tnn

    from s2v_tpu.models.retinaface import retinaface_mnet
    from s2v_tpu.utils.weights import conversion_coverage, convert_retinaface_mnet

    net = load_ref_net()
    torch.manual_seed(33)

    class Head(tnn.Module):
        def __init__(self, cin, n):
            super().__init__()
            self.conv1x1 = tnn.Conv2d(cin, 2 * n, 1)

        def forward(self, x):
            out = self.conv1x1(x).permute(0, 2, 3, 1).contiguous()
            return out.view(out.shape[0], -1, self.conv1x1.out_channels // 2)

    class RefMnet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.body = net.MobileNetV1()
            self.fpn = net.FPN([64, 128, 256], 64)
            self.ssh1 = net.SSH(64, 64)
            self.ssh2 = net.SSH(64, 64)
            self.ssh3 = net.SSH(64, 64)
            self.BboxHead = tnn.ModuleList([Head(64, 4) for _ in range(3)])
            self.ClassHead = tnn.ModuleList([Head(64, 2) for _ in range(3)])
            self.LandmarkHead = tnn.ModuleList([Head(64, 10) for _ in range(3)])

        def forward(self, x):
            s1 = self.body.stage1(x)
            s2 = self.body.stage2(s1)
            s3 = self.body.stage3(s2)
            fpn = self.fpn({"1": s1, "2": s2, "3": s3})
            feats = [self.ssh1(fpn[0]), self.ssh2(fpn[1]), self.ssh3(fpn[2])]
            loc = torch.cat([self.BboxHead[i](f) for i, f in enumerate(feats)], 1)
            conf = torch.cat([self.ClassHead[i](f) for i, f in enumerate(feats)], 1)
            ldm = torch.cat([self.LandmarkHead[i](f) for i, f in enumerate(feats)], 1)
            return loc, torch.nn.functional.softmax(conf, -1), ldm

    ref = RefMnet().eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()
          if not k.startswith("body.fc.")}  # IntermediateLayerGetter drops fc
    variables, leftover = conversion_coverage(convert_retinaface_mnet, sd)
    assert leftover == []

    x = RNG.randn(1, 64, 64, 3).astype(np.float32) * 20
    with torch.no_grad():
        wl, wc, wm = ref(torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
    gl, gc, gm = retinaface_mnet().apply(
        jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x))
    assert gl.shape == wl.shape  # (1, (8^2+4^2+2^2)*2, 4)
    np.testing.assert_allclose(np.asarray(gl), wl.numpy(), rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gc), wc.numpy(), rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gm), wm.numpy(), rtol=0, atol=2e-4)
