"""Synthesize reference-format checkpoint files from randomly-initialized
reference torch models (imported read-only from /root/reference as oracles).

Real weights are not available in this image; these checkpoints exercise the
FULL load path — torch .pth parsing, every converter in s2v_tpu.utils.weights,
and model construction — with the exact key names and shapes the real files
have. Used by the verify drive and the parity harness.

    PYTHONPATH=/root/repo python tools/make_synth_ckpts.py [outdir]

writes (default /tmp/ckpts):
  s3fd.pth 2DFAN4.pth face3d_pretrain_epoch_20.pth DNet.pt LNet.pth ENet.pth
  expression.mat BFM/similarity_Lm3D_all.mat RetinaFace-R50.pth
  ParseNet-latest.pth GFPGANv1.4.pth GPEN-BFR-512.pth GPEN-BFR-2048.pth
  realesrnet_x2.pth 30_net_gen.pth vgg16.pth
plus a synthetic clip: <outdir>/clip/face.npz + speech.wav.
"""

import importlib.util
import os
import sys
import types

import numpy as np

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _install_stubs():
    """Stubs for deps absent in this image (basicsr, torchsummary, kornia) —
    same as tests/test_weight_parity.py."""
    if "basicsr" not in sys.modules:
        basicsr = types.ModuleType("basicsr")
        archs = types.ModuleType("basicsr.archs")
        arch_util = types.ModuleType("basicsr.archs.arch_util")

        def default_init_weights(module_list, scale=1, bias_fill=0, **kwargs):
            import torch.nn as nn

            if not isinstance(module_list, list):
                module_list = [module_list]
            for module in module_list:
                mods = module.modules() if hasattr(module, "modules") else [module]
                for m in mods:
                    if isinstance(m, (nn.Conv2d, nn.Linear)) and m.bias is not None:
                        m.bias.data.fill_(bias_fill)

        arch_util.default_init_weights = default_init_weights
        archs.arch_util = arch_util
        basicsr.archs = archs
        utils = types.ModuleType("basicsr.utils")
        registry = types.ModuleType("basicsr.utils.registry")

        class _Registry:
            def register(self, obj=None):
                return (lambda o: o) if obj is None else obj

        registry.ARCH_REGISTRY = _Registry()
        utils.registry = registry
        basicsr.utils = utils
        for name, mod in [("basicsr", basicsr), ("basicsr.archs", archs),
                          ("basicsr.archs.arch_util", arch_util),
                          ("basicsr.utils", utils),
                          ("basicsr.utils.registry", registry)]:
            sys.modules[name] = mod
    if "torchsummary" not in sys.modules:
        ts = types.ModuleType("torchsummary")
        ts.summary = lambda *a, **k: None
        sys.modules["torchsummary"] = ts
    if "kornia" not in sys.modules:
        kornia = types.ModuleType("kornia")
        geometry = types.ModuleType("kornia.geometry")
        geometry.warp_affine = lambda *a, **k: None
        kornia.geometry = geometry
        sys.modules["kornia"] = kornia
        sys.modules["kornia.geometry"] = geometry
    if REF not in sys.path:
        sys.path.insert(0, REF)


def _load(name, path, extra_path=None):
    if extra_path and extra_path not in sys.path:
        sys.path.insert(0, extra_path)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _resnet50_body_sd(rs):
    """torchvision resnet50 state dict (numpy), the RetinaFace-R50 backbone
    naming convert_retinaface expects (weights.py:728-744)."""
    sd = {}

    def conv(name, co, ci, k):
        sd[f"{name}.weight"] = rs.randn(co, ci, k, k).astype(np.float32) * 0.05

    def bn(name, c):
        sd[f"{name}.weight"] = np.abs(rs.randn(c)).astype(np.float32) + 0.5
        sd[f"{name}.bias"] = rs.randn(c).astype(np.float32) * 0.05
        sd[f"{name}.running_mean"] = rs.randn(c).astype(np.float32) * 0.05
        sd[f"{name}.running_var"] = np.abs(rs.randn(c)).astype(np.float32) + 0.5
        sd[f"{name}.num_batches_tracked"] = np.asarray(0, np.int64)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    cin = 64
    for stage, (n, width) in enumerate(zip((3, 4, 6, 3), (64, 128, 256, 512))):
        cout = width * 4
        for b in range(n):
            p = f"layer{stage + 1}.{b}"
            conv(f"{p}.conv1", width, cin if b == 0 else cout, 1)
            bn(f"{p}.bn1", width)
            conv(f"{p}.conv2", width, width, 3)
            bn(f"{p}.bn2", width)
            conv(f"{p}.conv3", cout, width, 1)
            bn(f"{p}.bn3", cout)
            if b == 0:
                conv(f"{p}.downsample.0", cout, cin, 1)
                bn(f"{p}.downsample.1", cout)
        cin = cout
    return sd


def _retinaface_sd(rs):
    """Full RetinaFace-R50 state dict (facemodels/retinaface.py:48-140
    layout): resnet50 'body.', FPN, 3x SSH, 3x per-level heads (2 anchors)."""
    sd = {f"body.{k}": v for k, v in _resnet50_body_sd(rs).items()}

    def convbn(name, co, ci, k):
        sd[f"{name}.0.weight"] = rs.randn(co, ci, k, k).astype(np.float32) * 0.05
        sd[f"{name}.1.weight"] = np.abs(rs.randn(co)).astype(np.float32) + 0.5
        sd[f"{name}.1.bias"] = rs.randn(co).astype(np.float32) * 0.05
        sd[f"{name}.1.running_mean"] = rs.randn(co).astype(np.float32) * 0.05
        sd[f"{name}.1.running_var"] = np.abs(rs.randn(co)).astype(np.float32) + 0.5
        sd[f"{name}.1.num_batches_tracked"] = np.asarray(0, np.int64)

    oc = 256
    for name, ci, k in [("fpn.output1", 512, 1), ("fpn.output2", 1024, 1),
                        ("fpn.output3", 2048, 1), ("fpn.merge1", oc, 3),
                        ("fpn.merge2", oc, 3)]:
        convbn(name, oc, ci, k)
    half = oc // 2
    quarter = oc // 4
    for i in (1, 2, 3):
        convbn(f"ssh{i}.conv3X3", half, oc, 3)
        convbn(f"ssh{i}.conv5X5_1", quarter, oc, 3)
        convbn(f"ssh{i}.conv5X5_2", quarter, quarter, 3)
        convbn(f"ssh{i}.conv7X7_2", quarter, quarter, 3)
        convbn(f"ssh{i}.conv7x7_3", quarter, quarter, 3)
    for i in range(3):
        for head, ch in [("BboxHead", 8), ("ClassHead", 4), ("LandmarkHead", 20)]:
            sd[f"{head}.{i}.conv1x1.weight"] = (
                rs.randn(ch, oc, 1, 1).astype(np.float32) * 0.05)
            sd[f"{head}.{i}.conv1x1.bias"] = rs.randn(ch).astype(np.float32) * 0.05
    return sd


def _vgg16_features_sd(rs):
    """torchvision vgg16 'features.N.*' keys (models/vgg.py VGG16_CFG)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
    sd = {}
    cin, idx = 3, 0
    for v in cfg:
        if v == "M":
            idx += 1
            continue
        sd[f"features.{idx}.weight"] = rs.randn(v, cin, 3, 3).astype(np.float32) * 0.05
        sd[f"features.{idx}.bias"] = rs.randn(v).astype(np.float32) * 0.05
        cin = v
        idx += 2
    return sd


def main(outdir="/tmp/ckpts"):
    _install_stubs()
    import torch
    from scipy.io import savemat

    torch.manual_seed(0)
    rs = np.random.RandomState(0)
    os.makedirs(outdir, exist_ok=True)
    os.makedirs(os.path.join(outdir, "BFM"), exist_ok=True)

    def save(name, obj):
        torch.save(obj, os.path.join(outdir, name))
        print("wrote", name)

    def np_sd(sd):
        return {k: torch.from_numpy(np.ascontiguousarray(v))
                if isinstance(v, np.ndarray) else torch.tensor(v)
                for k, v in sd.items()}

    # --- core generator stack --------------------------------------------
    from models.LNet import LNet as RefLNet
    from models.ENet import ENet as RefENet
    from models.DNet import DNet as RefDNet

    lnet = RefLNet().eval()
    save("LNet.pth", {"state_dict": lnet.state_dict()})
    save("ENet.pth", {"state_dict": RefENet(lnet=lnet).eval().state_dict()})
    save("DNet.pt", {"net_G_ema": RefDNet().eval().state_dict()})

    # --- detection / landmarks / 3DMM -------------------------------------
    s3 = _load("ref_net_s3fd",
               f"{REF}/third_part/face_detection/detection/sfd/net_s3fd.py")
    save("s3fd.pth", s3.s3fd().state_dict())
    fanm = _load("ref_fan_models", f"{REF}/third_part/face_detection/models.py")
    save("2DFAN4.pth", fanm.FAN(4).state_dict())

    if f"{REF}/third_part" not in sys.path:
        sys.path.insert(0, f"{REF}/third_part")
    from face3d.models import networks

    save("face3d_pretrain_epoch_20.pth",
         {"net_recon": networks.ReconNetWrapper(
             "resnet50", use_last_fc=False).eval().state_dict()})

    savemat(os.path.join(outdir, "expression.mat"),
            {"expression_center": rs.randn(1, 64).astype(np.float32) * 0.1})
    savemat(os.path.join(outdir, "BFM", "similarity_Lm3D_all.mat"),
            {"lm": (rs.rand(68, 3).astype(np.float64) - 0.5)})

    # --- restoration stack -------------------------------------------------
    save("RetinaFace-R50.pth", np_sd(_retinaface_sd(rs)))

    pm = _load("ref_parse_model",
               f"{REF}/third_part/GPEN/face_parse/parse_model.py",
               extra_path=f"{REF}/third_part/GPEN/face_parse")
    # FaceParse config (face_parsing.py:34)
    save("ParseNet-latest.pth",
         pm.ParseNet(512, 512, 32, 64, 19, norm_type="bn",
                     relu_type="LeakyReLU", ch_range=[32, 256]).state_dict())

    gm = _load("ref_gpen_model",
               f"{REF}/third_part/GPEN/face_model/gpen_model.py",
               extra_path=f"{REF}/third_part/GPEN/face_model")
    save("GPEN-BFR-512.pth",
         gm.FullGenerator(512, 512, 8, channel_multiplier=2, narrow=1,
                          device="cpu").state_dict())
    save("GPEN-BFR-2048.pth",
         gm.FullGenerator(2048, 512, 8, channel_multiplier=2, narrow=1,
                          device="cpu").state_dict())

    rr = _load("ref_rrdbnet", f"{REF}/third_part/GPEN/sr_model/rrdbnet_arch.py",
               extra_path=f"{REF}/third_part/GPEN/sr_model")
    save("realesrnet_x2.pth",
         {"params_ema": rr.RRDBNet(3, 3, num_feat=32, num_block=23,
                                   num_grow_ch=32, scale=2).state_dict()})

    # gfpganv1_clean_arch does a relative import; load it as part of a
    # synthetic package (same trick as tests/test_gfpgan.py:60-80)
    base = f"{REF}/third_part/GFPGAN/gfpgan/archs"
    pkg = types.ModuleType("gfpgan_archs")
    pkg.__path__ = [base]
    sys.modules["gfpgan_archs"] = pkg
    sg = _load("gfpgan_archs.stylegan2_clean_arch",
               f"{base}/stylegan2_clean_arch.py")
    sys.modules["gfpgan_archs.stylegan2_clean_arch"] = sg
    gc = _load("gfpgan_archs.gfpganv1_clean_arch",
               f"{base}/gfpganv1_clean_arch.py")
    save("GFPGANv1.4.pth",
         {"params_ema": gc.GFPGANv1Clean(
             out_size=512, num_style_feat=512, channel_multiplier=2,
             decoder_load_path=None, fix_decoder=False, num_mlp=8,
             input_is_latent=True, different_w=True, narrow=1,
             sft_half=True).eval().state_dict()})

    mu = _load("ref_ganimation_utils",
               f"{REF}/third_part/ganimation_replicate/model/model_utils.py")
    import torch.nn as nn
    import functools

    norm_layer = functools.partial(nn.InstanceNorm2d, affine=False,
                                   track_running_stats=False)
    save("30_net_gen.pth",
         mu.SplitGenerator(3, 17, ngf=64, norm_layer=norm_layer,
                           use_dropout=False, n_blocks=6).state_dict())

    save("vgg16.pth", np_sd(_vgg16_features_sd(rs)))

    # --- synthetic clip ----------------------------------------------------
    import wave

    clipdir = os.path.join(outdir, "clip")
    os.makedirs(clipdir, exist_ok=True)
    frames = (rs.rand(8, 160, 144, 3) * 255).astype(np.uint8)
    np.savez(os.path.join(clipdir, "face.npz"), frames=frames, fps=25.0)
    t = np.arange(int(0.4 * 16000)) / 16000.0
    pcm = (np.sin(2 * np.pi * 220 * t) * 0.4 * 32767).astype(np.int16)
    with wave.open(os.path.join(clipdir, "speech.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    print("wrote clip/face.npz clip/speech.wav")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ckpts")
