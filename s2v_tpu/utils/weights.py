"""PyTorch checkpoint -> flax variables conversion.

The reference distributes weights as torch ``state_dict``s (DNet_path /
LNet_path / ENet_path, futils/inference_utils.py:19-22, loaded by
models/__init__.py:8-56). This module maps those flat name->tensor dicts onto
the s2v_tpu model trees:

- conv weights transpose OIHW -> HWIO (conv1d: OIk -> kIO; transposed convs:
  IOhw -> hwOI), linear weights transpose [out,in] -> [in,out]
- spectral-normalized convs (use_spect=True paths: all LNet encoder/decoder
  block convs) are folded: weight = weight_orig / sigma with
  sigma = u . (W_mat @ v) from the stored power-iteration vectors — exactly
  what torch computes in eval mode
- LayerNorm2d affine params reshape (C,1,1) -> (C,)
- BatchNorm running stats land in the 'batch_stats' collection

Every converter is validated structurally against ``model.init`` trees and
numerically against the reference torch modules (tests/test_weight_parity.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


class SDView:
    """Prefix view over a flat torch state_dict of numpy arrays."""

    def __init__(self, sd: Dict[str, np.ndarray], prefix: str = ""):
        self.sd = sd
        self.prefix = prefix

    def sub(self, name: str) -> "SDView":
        return SDView(self.sd, f"{self.prefix}{name}.")

    def __contains__(self, name: str) -> bool:
        return f"{self.prefix}{name}" in self.sd

    def get(self, name: str) -> np.ndarray:
        return np.asarray(self.sd[f"{self.prefix}{name}"], dtype=np.float32)

    # --- layer extractors -------------------------------------------------

    def conv_weight(self, name: str) -> np.ndarray:
        """Conv2d weight with optional spectral-norm folding; OIHW -> HWIO."""
        if f"{name}.weight_orig" in self:
            w = self.get(f"{name}.weight_orig")
            u = self.get(f"{name}.weight_u")
            v = self.get(f"{name}.weight_v")
            sigma = float(u @ (w.reshape(w.shape[0], -1) @ v))
            w = w / sigma
        else:
            w = self.get(f"{name}.weight")
        return np.transpose(w, (2, 3, 1, 0))

    def conv(self, name: str, bias: bool = True) -> Dict[str, np.ndarray]:
        out = {"weight": self.conv_weight(name)}
        if bias and f"{name}.bias" in self:
            out["bias"] = self.get(f"{name}.bias")
        return out

    def conv1d(self, name: str) -> Tuple[np.ndarray, np.ndarray]:
        w = self.get(f"{name}.weight")  # [O, I, k]
        return np.transpose(w, (2, 1, 0)), self.get(f"{name}.bias")

    def conv_transpose(self, name: str) -> Dict[str, np.ndarray]:
        w = self.get(f"{name}.weight")  # torch [I, O, kh, kw]
        out = {"weight": np.transpose(w, (2, 3, 1, 0))}  # [kh,kw,O,I]
        if f"{name}.bias" in self:
            out["bias"] = self.get(f"{name}.bias")
        return out

    def linear(self, name: str, bias: bool = True) -> Dict[str, np.ndarray]:
        out = {"weight": np.transpose(self.get(f"{name}.weight"))}
        if bias and f"{name}.bias" in self:
            out["bias"] = self.get(f"{name}.bias")
        return out

    def ln2d(self, name: str) -> Dict[str, np.ndarray]:
        """LayerNorm2d (C,1,1) affine -> (C,)."""
        return {
            "weight": self.get(f"{name}.weight").reshape(-1),
            "bias": self.get(f"{name}.bias").reshape(-1),
        }

    def ln(self, name: str) -> Dict[str, np.ndarray]:
        return {"weight": self.get(f"{name}.weight"), "bias": self.get(f"{name}.bias")}

    def bn(self, name: str) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
        params = {"weight": self.get(f"{name}.weight"), "bias": self.get(f"{name}.bias")}
        stats = {
            "running_mean": self.get(f"{name}.running_mean"),
            "running_var": self.get(f"{name}.running_var"),
        }
        return params, stats

    def adain(self, name: str) -> Dict[str, np.ndarray]:
        v = self.sub(name)
        return {
            "mlp_shared": v.linear("mlp_shared.0"),
            "mlp_gamma": v.linear("mlp_gamma"),
            "mlp_beta": v.linear("mlp_beta"),
        }


def _norm_block(view: SDView, conv_idx: int = 0, norm_idx: int = 1):
    """conv + LayerNorm2d blocks (FirstBlock2d/DownBlock2d/UpBlock2d/Jump)."""
    return {
        "conv": view.conv(f"model.{conv_idx}"),
        "norm": view.ln2d(f"model.{norm_idx}"),
    }


# --------------------------------------------------------------------------
# LNet
# --------------------------------------------------------------------------

def convert_lnet(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    v = SDView(sd, prefix)
    params: Dict = {}
    stats: Dict = {}

    # ---- encoder ----
    enc = v.sub("encoder")
    e: Dict = {
        "first_inp": _norm_block(enc.sub("first_inp")),
        "first_ref": _norm_block(enc.sub("first_ref")),
    }
    for i in range(3):
        e[f"inp_down{i}"] = _norm_block(enc.sub(f"inp_down{i}"))
        e[f"ref_down{i}"] = _norm_block(enc.sub(f"ref_down{i}"))
    # cross-attention at level 2
    ca = enc.sub("ca2")
    ca_p: Dict = {}
    for d in range(2):
        lay = ca.sub(f"layers.{d}")
        ca_p[f"normx{d}"] = lay.ln("0.normx")
        ca_p[f"normy{d}"] = lay.ln("0.normy")
        ca_p[f"attn{d}"] = {
            "to_q": lay.linear("0.fn.to_q", bias=False),
            "to_k": lay.linear("0.fn.to_k", bias=False),
            "to_v": lay.linear("0.fn.to_v", bias=False),
            "to_out": lay.linear("0.fn.to_out.0"),
        }
        ca_p[f"normf{d}"] = lay.ln("1.norm")
        ca_p[f"ff{d}"] = {
            "fc1": lay.linear("1.fn.net.0"),
            "fc2": lay.linear("1.fn.net.3"),
        }
    e["ca2"] = ca_p
    params["encoder"] = e

    # ---- audio encoder ----
    ae = v.sub("audio_encoder")
    ae_p: Dict = {}
    ae_s: Dict = {}
    for k in range(13):
        name = f"conv{k}" if k <= 10 else ("conv11" if k == 11 else "conv12")
        blk = ae.sub(f"{k}")
        bn_p, bn_s = blk.bn("conv_block.1")
        ae_p[name] = {"conv": blk.conv("conv_block.0"), "bn": bn_p}
        ae_s[name] = {"bn": bn_s}
    params["audio_encoder"] = ae_p
    stats["audio_encoder"] = ae_s

    # ---- decoder ----
    dec = v.sub("decoder")
    d_p: Dict = {}
    d_s: Dict = {}
    for i in range(3):
        res_p: Dict = {}
        res_s: Dict = {}
        for j in range(9):
            blk = dec.sub(f"res{i}.res{j}")
            bp: Dict = {}
            bs: Dict = {}
            for conv_name in ("conv1", "conv2"):
                lama = blk.sub(conv_name)
                ffc = lama.sub("ffc")
                st = ffc.sub("convg2g")
                st_conv1_bn_p, st_conv1_bn_s = st.bn("conv1.1")
                fu = st.sub("fu")
                fu_bn_p, fu_bn_s = fu.bn("bn")
                bp[conv_name] = {
                    "ffc": {
                        "convl2l": ffc.conv("convl2l", bias=False),
                        "convl2g": ffc.conv("convl2g", bias=False),
                        "convg2l": ffc.conv("convg2l", bias=False),
                        "convg2g": {
                            "conv1": {"weight": st.conv_weight("conv1.0")},
                            "conv1_bn": st_conv1_bn_p,
                            "fu": {
                                "conv_layer": {"weight": fu.conv_weight("conv_layer")},
                                "bn": fu_bn_p,
                            },
                            "conv2": {"weight": st.conv_weight("conv2")},
                        },
                    },
                    "bn_l": lama.adain("bn_l"),
                    "bn_g": lama.adain("bn_g"),
                }
                bs[conv_name] = {
                    "ffc": {
                        "convg2g": {
                            "conv1_bn": st_conv1_bn_s,
                            "fu": {"bn": fu_bn_s},
                        }
                    }
                }
            res_p[f"res{j}"] = bp
            res_s[f"res{j}"] = bs
        d_p[f"res{i}"] = res_p
        d_s[f"res{i}"] = res_s
        d_p[f"up{i}"] = _norm_block(dec.sub(f"up{i}"))
        d_p[f"jump{i}"] = _norm_block(dec.sub(f"jump{i}"))
    d_p["final"] = {"conv": dec.conv("final.model.0")}
    params["decoder"] = d_p
    stats["decoder"] = d_s

    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------
# ENet
# --------------------------------------------------------------------------

def convert_enet(
    sd: Dict[str, np.ndarray],
    lnet_sd: Optional[Dict[str, np.ndarray]] = None,
    prefix: str = "",
) -> Dict:
    """ENet state_dict (+ separate LNet state_dict, as the reference loads
    them: models/__init__.py:29-35 skips 'low_res' keys from the ENet file
    and loads LNet_path into the wrapped LNet)."""
    v = SDView(sd, prefix)
    se: Dict = {
        "conv_body_first": v.conv("conv_body_first"),
        "final_conv": v.conv("final_conv"),
        "final_linear": v.linear("final_linear"),
    }
    for i in range(6):
        blk = v.sub(f"conv_body_down.{i}")
        se[f"conv_body_down{i}"] = {
            "conv1": blk.conv("conv1"),
            "conv2": blk.conv("conv2"),
            "skip": blk.conv("skip", bias=False),
        }

    def modconv(view: SDView) -> Dict:
        w = view.get("weight")[0]  # (1,O,I,k,k) -> (O,I,k,k)
        return {
            "weight": np.transpose(w, (2, 3, 1, 0)),
            "modulation": view.linear("modulation"),
        }

    params: Dict = {"style_encoder": se}
    for k in range(4):
        sc = v.sub(f"style_convs.{k}")
        params[f"style_conv{k}"] = {
            "modulated_conv": modconv(sc.sub("modulated_conv")),
            "noise_weight": sc.get("weight"),
            "bias": sc.get("bias").reshape(-1),
        }
    for k in range(2):
        rgb = v.sub(f"to_rgbs.{k}")
        params[f"to_rgb{k}"] = {
            "modulated_conv": modconv(rgb.sub("modulated_conv")),
            "bias": rgb.get("bias").reshape(-1),
        }

    stats: Dict = {}
    if lnet_sd is not None:
        lnet_vars = convert_lnet(lnet_sd)
        params["low_res"] = lnet_vars["params"]
        stats["low_res"] = lnet_vars["batch_stats"]
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------
# DNet
# --------------------------------------------------------------------------

def convert_dnet(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    v = SDView(sd, prefix)

    # ---- mapping net ----
    mp = v.sub("mapping_net")
    m: Dict = {}
    w, b = mp.conv1d("first.0")
    m["first_weight"], m["first_bias"] = w, b
    for i in range(3):
        w, b = mp.conv1d(f"encoder{i}.1")
        m[f"encoder{i}_weight"], m[f"encoder{i}_bias"] = w, b

    # ---- warping net ----
    wp = v.sub("warpping_net")
    hg = wp.sub("hourglass")
    h: Dict = {"input_layer": hg.conv("encoder.input_layer")}
    for i in range(5):
        blk = hg.sub(f"encoder.encoder{i}")
        h[f"encoder{i}"] = {
            "conv_0": blk.conv("conv_0"),
            "conv_1": blk.conv("conv_1"),
            "norm_0": blk.adain("norm_0"),
            "norm_1": blk.adain("norm_1"),
        }
    for i in range(2, 5):
        blk = hg.sub(f"decoder.decoder{i}")
        h[f"decoder{i}"] = {
            "conv_0": blk.conv("conv_0"),
            "conv_1": blk.conv_transpose("conv_1"),
            "conv_s": blk.conv_transpose("conv_s"),
            "norm_0": blk.adain("norm_0"),
            "norm_1": blk.adain("norm_1"),
            "norm_s": blk.adain("norm_s"),
        }
    warp = {
        "hourglass": h,
        "flow_norm": wp.ln2d("flow_out.0"),
        "flow_conv": wp.conv("flow_out.2"),
    }

    # ---- editing net ----
    ed = v.sub("editing_net")
    enc: Dict = {"first": _norm_block(ed.sub("encoder.first"))}
    for i in range(3):
        enc[f"down{i}"] = _norm_block(ed.sub(f"encoder.down{i}"))
    dec: Dict = {}
    for i in range(3):
        res: Dict = {}
        for j in range(2):
            blk = ed.sub(f"decoder.res{i}.res{j}")
            res[f"res{j}"] = {
                "conv1": blk.conv("conv1"),
                "conv2": blk.conv("conv2"),
                "norm1": blk.adain("norm1"),
                "norm2": blk.adain("norm2"),
            }
        dec[f"res{i}"] = res
        dec[f"up{i}"] = _norm_block(ed.sub(f"decoder.up{i}"))
        dec[f"jump{i}"] = _norm_block(ed.sub(f"decoder.jump{i}"))
    dec["final"] = {"conv": ed.conv("decoder.final.model.0")}

    params = {
        "mapping_net": m,
        "warpping_net": warp,
        "editing_net": {"encoder": enc, "decoder": dec},
    }
    return {"params": params, "batch_stats": {}}


def load_torch_checkpoint(path: str, key: Optional[str] = "state_dict",
                          strip_module: bool = True) -> Dict[str, np.ndarray]:
    """torch.load a checkpoint file to a flat numpy state_dict.

    Mirrors models/__init__.py:12-27: unwraps the 'state_dict' key when
    present and strips 'module.' DataParallel prefixes.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if key and isinstance(ckpt, dict) and key in ckpt:
        ckpt = ckpt[key]
    out = {}
    for k, t in ckpt.items():
        if strip_module and k.startswith("module."):
            k = k[len("module."):]
        out[k] = t.detach().cpu().numpy()
    return out


# --------------------------------------------------------------------------
# S3FD face detector
# --------------------------------------------------------------------------

_S3FD_CONVS = [
    "conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1", "conv3_2",
    "conv3_3", "conv4_1", "conv4_2", "conv4_3", "conv5_1", "conv5_2",
    "conv5_3", "fc6", "fc7", "conv6_1", "conv6_2", "conv7_1", "conv7_2",
    "conv3_3_norm_mbox_conf", "conv3_3_norm_mbox_loc",
    "conv4_3_norm_mbox_conf", "conv4_3_norm_mbox_loc",
    "conv5_3_norm_mbox_conf", "conv5_3_norm_mbox_loc",
    "fc7_mbox_conf", "fc7_mbox_loc", "conv6_2_mbox_conf", "conv6_2_mbox_loc",
    "conv7_2_mbox_conf", "conv7_2_mbox_loc",
]


def convert_s3fd(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """S3FD checkpoint (net_s3fd.py layer names) -> flax variables."""
    v = SDView(sd, prefix)
    params: Dict = {}
    for name in _S3FD_CONVS:
        params[name] = v.conv(name)
    for name in ("conv3_3_norm", "conv4_3_norm", "conv5_3_norm"):
        params[name] = {"weight": v.get(f"{name}.weight")}
    return {"params": params}


# --------------------------------------------------------------------------
# FAN landmark network
# --------------------------------------------------------------------------

def _fan_convblock(v: SDView) -> Dict:
    out = {}
    for i in (1, 2, 3):
        bn_p, bn_s = v.bn(f"bn{i}")
        out[f"bn{i}"] = bn_p
        out[f"bn{i}__stats"] = bn_s
        out[f"conv{i}"] = v.conv(f"conv{i}", bias=False)
    if "downsample.0.weight" in v:
        bn_p, bn_s = v.bn("downsample.0")
        out["downsample_bn"] = bn_p
        out["downsample_bn__stats"] = bn_s
        out["downsample_conv"] = v.conv("downsample.2", bias=False)
    return out


def _split_stats(tree: Dict) -> Tuple[Dict, Dict]:
    """Separate '<name>__stats' entries into a parallel batch_stats tree."""
    params: Dict = {}
    stats: Dict = {}
    for k, val in tree.items():
        if k.endswith("__stats"):
            stats[k[: -len("__stats")]] = val
        elif isinstance(val, dict):
            p, s = _split_stats(val)
            params[k] = p
            if s:
                stats[k] = s
        else:
            params[k] = val
    return params, stats


def convert_fan(sd: Dict[str, np.ndarray], num_modules: int = 4,
                prefix: str = "") -> Dict:
    """FAN checkpoint (face_detection/models.py names) -> flax variables."""
    v = SDView(sd, prefix)
    tree: Dict = {"conv1": v.conv("conv1")}
    bn_p, bn_s = v.bn("bn1")
    tree["bn1"] = bn_p
    tree["bn1__stats"] = bn_s
    for name in ("conv2", "conv3", "conv4"):
        tree[name] = _fan_convblock(v.sub(name))

    for i in range(num_modules):
        hg: Dict = {}
        for lvl in range(1, 5):
            hg[f"b1_{lvl}"] = _fan_convblock(v.sub(f"m{i}.b1_{lvl}"))
            hg[f"b2_{lvl}"] = _fan_convblock(v.sub(f"m{i}.b2_{lvl}"))
            hg[f"b3_{lvl}"] = _fan_convblock(v.sub(f"m{i}.b3_{lvl}"))
        hg["b2_plus_1"] = _fan_convblock(v.sub(f"m{i}.b2_plus_1"))
        tree[f"m{i}"] = hg
        tree[f"top_m_{i}"] = _fan_convblock(v.sub(f"top_m_{i}"))
        tree[f"conv_last{i}"] = v.conv(f"conv_last{i}")
        bn_p, bn_s = v.bn(f"bn_end{i}")
        tree[f"bn_end{i}"] = bn_p
        tree[f"bn_end{i}__stats"] = bn_s
        tree[f"l{i}"] = v.conv(f"l{i}")
        if i < num_modules - 1:
            tree[f"bl{i}"] = v.conv(f"bl{i}")
            tree[f"al{i}"] = v.conv(f"al{i}")

    params, stats = _split_stats(tree)
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------
# ReconNet (Deep3DFaceRecon ResNet50 -> 257 coeffs)
# --------------------------------------------------------------------------

def _bottleneck(v: SDView) -> Dict:
    out: Dict = {}
    for i in (1, 2, 3):
        out[f"conv{i}"] = v.conv(f"conv{i}", bias=False)
        bn_p, bn_s = v.bn(f"bn{i}")
        out[f"bn{i}"] = bn_p
        out[f"bn{i}__stats"] = bn_s
    if "downsample.0.weight" in v:
        out["downsample_conv"] = v.conv("downsample.0", bias=False)
        bn_p, bn_s = v.bn("downsample.1")
        out["downsample_bn"] = bn_p
        out["downsample_bn__stats"] = bn_s
    return out


def convert_recon_net(sd: Dict[str, np.ndarray], prefix: str = "",
                      layers=(3, 4, 6, 3)) -> Dict:
    """Deep3DFaceRecon checkpoint ('net_recon' key: backbone.* +
    final_layers.*, networks.py:69-104) -> flax variables."""
    v = SDView(sd, prefix)
    bb = v.sub("backbone")
    tree: Dict = {"conv1": bb.conv("conv1", bias=False)}
    bn_p, bn_s = bb.bn("bn1")
    tree["bn1"] = bn_p
    tree["bn1__stats"] = bn_s
    for stage, n in enumerate(layers):
        for b in range(n):
            tree[f"layer{stage + 1}_{b}"] = _bottleneck(
                bb.sub(f"layer{stage + 1}.{b}")
            )
    backbone_p, backbone_s = _split_stats(tree)
    params: Dict = {"backbone": backbone_p}
    for i in range(7):
        params[f"head{i}"] = v.conv(f"final_layers.{i}")
    return {"params": params, "batch_stats": {"backbone": backbone_s}}


# --------------------------------------------------------------------------
# GFPGAN v1 clean
# --------------------------------------------------------------------------

def _gfpgan_resblock(v: SDView) -> Dict:
    return {
        "conv1": v.conv("conv1"),
        "conv2": v.conv("conv2"),
        "skip": v.conv("skip", bias=False),
    }


def _modconv(v: SDView) -> Dict:
    w = v.get("weight")[0]  # (1,O,I,k,k) -> (O,I,k,k)
    return {
        "weight": np.transpose(w, (2, 3, 1, 0)),
        "modulation": v.linear("modulation"),
    }


def _styleconv(v: SDView) -> Dict:
    return {
        "modulated_conv": _modconv(v.sub("modulated_conv")),
        "noise_weight": v.get("weight"),
        "bias": v.get("bias").reshape(-1),
    }


def _torgb(v: SDView) -> Dict:
    return {
        "modulated_conv": _modconv(v.sub("modulated_conv")),
        "bias": v.get("bias").reshape(-1),
    }


def convert_gfpgan_clean(sd: Dict[str, np.ndarray], out_size: int = 512,
                         num_mlp: int = 8, prefix: str = "") -> Dict:
    """GFPGANv1Clean checkpoint ('params_ema'/'params' key) -> flax vars."""
    import math

    v = SDView(sd, prefix)
    log_size = int(math.log2(out_size))
    params: Dict = {
        "conv_body_first": v.conv("conv_body_first"),
        "final_conv": v.conv("final_conv"),
        "final_linear": v.linear("final_linear"),
    }
    for idx in range(log_size - 2):
        params[f"conv_body_down{idx}"] = _gfpgan_resblock(
            v.sub(f"conv_body_down.{idx}")
        )
        params[f"conv_body_up{idx}"] = _gfpgan_resblock(v.sub(f"conv_body_up.{idx}"))
        for kind in ("scale", "shift"):
            blk = v.sub(f"condition_{kind}.{idx}")
            params[f"condition_{kind}{idx}_0"] = blk.conv("0")
            params[f"condition_{kind}{idx}_2"] = blk.conv("2")

    dec = v.sub("stylegan_decoder")
    d: Dict = {
        "constant_input": dec.get("constant_input.weight").transpose(0, 2, 3, 1),
        "style_conv1": _styleconv(dec.sub("style_conv1")),
        "to_rgb1": _torgb(dec.sub("to_rgb1")),
    }
    for i in range(num_mlp):
        d[f"style_mlp{i}"] = dec.linear(f"style_mlp.{2 * i + 1}")
    n_layers = (log_size - 2) * 2
    for k in range(n_layers):
        d[f"style_convs{k}"] = _styleconv(dec.sub(f"style_convs.{k}"))
    for k in range(log_size - 2):
        d[f"to_rgbs{k}"] = _torgb(dec.sub(f"to_rgbs.{k}"))
    params["stylegan_decoder"] = d
    return {"params": params}


# --------------------------------------------------------------------------
# GPEN (FullGenerator / FullGenerator_SR)
# --------------------------------------------------------------------------

def _gpen_modconv(v: SDView) -> Dict:
    w = v.get("weight")[0]  # (1,O,I,k,k)
    return {
        "weight": np.transpose(w, (2, 3, 1, 0)),
        "modulation": v.linear("modulation"),
    }


def _gpen_styledconv(v: SDView) -> Dict:
    return {
        "conv": _gpen_modconv(v.sub("conv")),
        "noise_weight": v.get("noise.weight"),
        "act_bias": v.get("activate.bias"),
    }


def _gpen_torgb(v: SDView) -> Dict:
    return {
        "conv": _gpen_modconv(v.sub("conv")),
        "bias": v.get("bias").reshape(-1),
    }


def _gpen_convlayer(v: SDView, downsample: bool) -> Dict:
    # ConvLayer is a Sequential: [Blur,] EqualConv2d, FusedLeakyReLU
    base = 1 if downsample else 0
    out = {"conv": {"weight": np.transpose(v.get(f"{base}.weight"), (2, 3, 1, 0))}}
    if f"{base}.bias" in v:
        out["conv"]["bias"] = v.get(f"{base}.bias")
    if f"{base + 1}.bias" in v:
        out["act_bias"] = v.get(f"{base + 1}.bias")
    return out


def _gpen_generator(v: SDView, size: int, n_mlp: int = 8) -> Dict:
    import math

    log_size = int(math.log2(size))
    d: Dict = {
        "constant_input": v.get("input.input").transpose(0, 2, 3, 1),
        "conv1": _gpen_styledconv(v.sub("conv1")),
        "to_rgb1": _gpen_torgb(v.sub("to_rgb1")),
    }
    for i in range(n_mlp):
        d[f"style{i}"] = v.linear(f"style.{i + 1}")
    for k in range(2 * (log_size - 2)):
        d[f"convs{k}"] = _gpen_styledconv(v.sub(f"convs.{k}"))
    for k in range(log_size - 2):
        d[f"to_rgbs{k}"] = _gpen_torgb(v.sub(f"to_rgbs.{k}"))
    return d


def convert_gpen_full(sd: Dict[str, np.ndarray], size: int = 512,
                      n_mlp: int = 8, in_size: Optional[int] = None,
                      prefix: str = "") -> Dict:
    """FullGenerator (in_size == None) or FullGenerator_SR checkpoints."""
    import math

    v = SDView(sd, prefix)
    enc_size = in_size if in_size is not None else size
    log_in = int(math.log2(enc_size))
    params: Dict = {"ecd0": _gpen_convlayer(v.sub("ecd0.0"), downsample=False)}
    for idx in range(1, log_in - 1):
        params[f"ecd{idx}"] = _gpen_convlayer(v.sub(f"ecd{idx}.0"), downsample=True)
    params["final_linear"] = v.linear("final_linear.0")
    params["generator"] = _gpen_generator(v.sub("generator"), size, n_mlp)
    return {"params": params}


# --------------------------------------------------------------------------
# ParseNet
# --------------------------------------------------------------------------

def _parse_convlayer(v: SDView) -> Dict:
    out = {"conv2d": v.conv("conv2d")}
    if "norm.norm.weight" in v:
        bn_p, bn_s = v.bn("norm.norm")
        out["norm"] = bn_p
        out["norm__stats"] = bn_s
    return out


def _parse_resblock(v: SDView) -> Dict:
    out: Dict = {
        "conv1": _parse_convlayer(v.sub("conv1")),
        "conv2": _parse_convlayer(v.sub("conv2")),
    }
    if "shortcut_func.conv2d.weight" in v:
        out["shortcut"] = _parse_convlayer(v.sub("shortcut_func"))
    return out


def convert_parsenet(sd: Dict[str, np.ndarray], down_steps: int = 4,
                     up_steps: int = 4, res_depth: int = 10,
                     prefix: str = "") -> Dict:
    v = SDView(sd, prefix)
    tree: Dict = {"encoder0": _parse_convlayer(v.sub("encoder.0"))}
    for i in range(down_steps):
        tree[f"encoder{i + 1}"] = _parse_resblock(v.sub(f"encoder.{i + 1}"))
    for i in range(res_depth):
        tree[f"body{i}"] = _parse_resblock(v.sub(f"body.{i}"))
    for i in range(up_steps):
        tree[f"decoder{i}"] = _parse_resblock(v.sub(f"decoder.{i}"))
    tree["out_img_conv"] = _parse_convlayer(v.sub("out_img_conv"))
    tree["out_mask_conv"] = _parse_convlayer(v.sub("out_mask_conv"))
    params, stats = _split_stats(tree)
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------
# RRDBNet
# --------------------------------------------------------------------------

def convert_rrdbnet(sd: Dict[str, np.ndarray], num_block: int = 23,
                    prefix: str = "") -> Dict:
    v = SDView(sd, prefix)
    params: Dict = {}
    for name in ("conv_first", "conv_body", "conv_up1", "conv_up2",
                 "conv_hr", "conv_last"):
        params[name] = v.conv(name)
    for i in range(num_block):
        blk: Dict = {}
        for j in (1, 2, 3):
            rdb = v.sub(f"body.{i}.rdb{j}")
            blk[f"rdb{j}"] = {f"conv{k}": rdb.conv(f"conv{k}") for k in range(1, 6)}
        params[f"body{i}"] = blk
    return {"params": params}


# --------------------------------------------------------------------------
# RetinaFace (cfg_re50)
# --------------------------------------------------------------------------

def _convbn(v: SDView) -> Dict:
    bn_p, bn_s = v.bn("1")
    return {"conv": v.conv("0", bias=False), "bn": bn_p, "bn__stats": bn_s}


def convert_retinaface(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """RetinaFace-R50 checkpoint -> flax variables. Backbone keys follow
    torchvision resnet50 naming under 'body.'."""
    v = SDView(sd, prefix)

    # backbone (torchvision resnet50 layout)
    bb = v.sub("body")
    tree: Dict = {"conv1": bb.conv("conv1", bias=False)}
    bn_p, bn_s = bb.bn("bn1")
    tree["bn1"] = bn_p
    tree["bn1__stats"] = bn_s
    for stage, n in enumerate((3, 4, 6, 3)):
        for b in range(n):
            tree[f"layer{stage + 1}_{b}"] = _bottleneck(
                bb.sub(f"layer{stage + 1}.{b}")
            )

    fpn = v.sub("fpn")
    tree["fpn"] = {
        name: _convbn(fpn.sub(name))
        for name in ("output1", "output2", "output3", "merge1", "merge2")
    }
    for i in (1, 2, 3):
        ssh = v.sub(f"ssh{i}")
        tree[f"ssh{i}"] = {
            name: _convbn(ssh.sub(name))
            for name in ("conv3X3", "conv5X5_1", "conv5X5_2", "conv7X7_2", "conv7x7_3")
        }
    for i in range(3):
        tree[f"BboxHead{i}"] = v.conv(f"BboxHead.{i}.conv1x1")
        tree[f"ClassHead{i}"] = v.conv(f"ClassHead.{i}.conv1x1")
        tree[f"LandmarkHead{i}"] = v.conv(f"LandmarkHead.{i}.conv1x1")

    params, stats = _split_stats(tree)
    body_p = {k: params.pop(k) for k in list(params) if k.startswith(("conv1", "bn1", "layer"))}
    body_s = {k: stats.pop(k) for k in list(stats) if k.startswith(("bn1", "layer"))}
    params["body"] = body_p
    stats["body"] = body_s
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------
# GANimation SplitGenerator
# --------------------------------------------------------------------------

def convert_ganimation(sd: Dict[str, np.ndarray], n_blocks: int = 6,
                       prefix: str = "") -> Dict:
    """SplitGenerator checkpoint (model_utils.py:419-482, zero padding,
    instance norm => only conv params in the state dict)."""
    v = SDView(sd, prefix)
    params: Dict = {"head": v.conv("model.0")}
    params["down0"] = v.conv("model.3")
    params["down1"] = v.conv("model.6")
    for i in range(n_blocks):
        blk = v.sub(f"model.{9 + i}.conv_block")
        params[f"res{i}"] = {"conv1": blk.conv("0"), "conv2": blk.conv("3")}
    base = 9 + n_blocks
    params["up0"] = v.conv_transpose(f"model.{base}")
    params["up1"] = v.conv_transpose(f"model.{base + 3}")
    params["color_top"] = v.conv("color_top.0", bias=False)
    params["au_top"] = v.conv("au_top.0", bias=False)
    return {"params": params}


# --------------------------------------------------------------------------
# IResNet (arcface backbone)
# --------------------------------------------------------------------------

def _ibasic(v: SDView) -> Dict:
    out: Dict = {}
    for i in (1, 2, 3):
        bn_p, bn_s = v.bn(f"bn{i}")
        out[f"bn{i}"] = bn_p
        out[f"bn{i}__stats"] = bn_s
    out["conv1"] = v.conv("conv1", bias=False)
    out["conv2"] = v.conv("conv2", bias=False)
    out["prelu"] = {"alpha": v.get("prelu.weight")}
    if "downsample.0.weight" in v:
        out["downsample_conv"] = v.conv("downsample.0", bias=False)
        bn_p, bn_s = v.bn("downsample.1")
        out["downsample_bn"] = bn_p
        out["downsample_bn__stats"] = bn_s
    return out


def convert_iresnet(sd: Dict[str, np.ndarray], layers=(3, 4, 14, 3),
                    prefix: str = "") -> Dict:
    v = SDView(sd, prefix)
    tree: Dict = {"conv1": v.conv("conv1", bias=False)}
    bn_p, bn_s = v.bn("bn1")
    tree["bn1"] = bn_p
    tree["bn1__stats"] = bn_s
    tree["prelu"] = {"alpha": v.get("prelu.weight")}
    for stage, n in enumerate(layers):
        for b in range(n):
            tree[f"layer{stage + 1}_{b}"] = _ibasic(v.sub(f"layer{stage + 1}.{b}"))
    bn_p, bn_s = v.bn("bn2")
    tree["bn2"] = bn_p
    tree["bn2__stats"] = bn_s
    tree["fc"] = v.linear("fc")
    params, stats = _split_stats(tree)
    params["features_weight"] = v.get("features.weight")
    params["features_bias"] = v.get("features.bias")
    stats["features_mean"] = v.get("features.running_mean")
    stats["features_var"] = v.get("features.running_var")
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------
# SyncNet (wav2lip SyncNet_color: face_encoder / audio_encoder Conv2d stacks)
# --------------------------------------------------------------------------

def convert_syncnet(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """wav2lip syncnet checkpoint -> s2v_tpu.pipeline.metrics.SyncNet vars.

    Torch layout: face_encoder.{i}.conv_block.{0 conv,1 bn},
    audio_encoder.{i}.conv_block.{0,1} — matching the module's layer specs
    (15 face convs, 14 audio convs)."""
    v = SDView(sd, prefix)
    params: Dict = {}
    stats: Dict = {}
    for enc, n, out_prefix in (("face_encoder", 15, "face"),
                               ("audio_encoder", 14, "audio")):
        for i in range(n):
            blk = v.sub(f"{enc}.{i}")
            bn_p, bn_s = blk.bn("conv_block.1")
            params[f"{out_prefix}{i}"] = {"conv": blk.conv("conv_block.0"),
                                          "bn": bn_p}
            stats[f"{out_prefix}{i}"] = {"bn": bn_s}
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------
# EnCodec 24 kHz (reference capability: third_part/emb/qnt.py — Meta EnCodec)
# --------------------------------------------------------------------------

def _encodec_normalize(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Canonicalize the two public EnCodec layouts to one key scheme.

    Meta (encodec pkg): encoder.model.{i}.conv.conv.weight_g/_v,
      ...convtr.convtr..., quantizer.vq.layers.{q}._codebook.embed
    HF (transformers):  encoder.layers.{i}.conv.parametrizations.weight
      .original0/original1, quantizer.layers.{q}.codebook.embed
    """
    out = {}
    for k in list(sd):
        v = sd[k]  # index (not .items()) so conversion_coverage records reads
        k = k.replace(".model.", ".layers.")
        k = k.replace("quantizer.vq.layers.", "quantizer.layers.")
        k = k.replace("._codebook.", ".codebook.")
        k = k.replace(".conv.conv.", ".conv.").replace(".convtr.convtr.", ".conv.")
        k = k.replace(".parametrizations.weight.original0", ".weight_g")
        k = k.replace(".parametrizations.weight.original1", ".weight_v")
        out[k] = np.asarray(v)
    return out


def _encodec_fold_wn(view: Dict[str, np.ndarray], key: str) -> np.ndarray:
    """weight_g [out,1,1] * weight_v/||v|| over (in, k) -> [out, in, k]."""
    v = view[f"{key}.weight_v"]
    g = view[f"{key}.weight_g"]
    return g * v / np.sqrt(np.sum(v * v, axis=(1, 2), keepdims=True) + 0.0)


def convert_encodec(sd: Dict[str, np.ndarray]) -> Dict:
    """EnCodec 24 kHz checkpoint -> s2v_tpu.models.encodec.EncodecModel params.

    Structure is discovered from the (canonicalized) layer indices rather
    than hardcoded, so ELU-index differences between layouts don't matter:
    plain-conv layers in order are [conv_in, down0..3/up0..3, conv_out],
    block layers are res0..3, the lstm layer splits into lstm0/lstm1.
    """
    sd = _encodec_normalize(sd)

    def classify(section: str):
        idxs = sorted({int(k.split(".")[2]) for k in sd
                       if k.startswith(f"{section}.layers.")})
        convs, blocks, lstms = [], [], []
        for i in idxs:
            p = f"{section}.layers.{i}"
            if f"{p}.lstm.weight_ih_l0" in sd:
                lstms.append(p)
            elif any(k.startswith(f"{p}.block.") for k in sd):
                blocks.append(p)
            else:
                convs.append(p)
        return convs, blocks, lstms

    def wn_conv(prefix: str, transposed: bool = False) -> Dict:
        w = _encodec_fold_wn(sd, f"{prefix}.conv")
        # torch conv [out,in,k] -> mine [k,in,out]; convtr [in,out,k] -> [k,out,in]
        return {"weight": np.ascontiguousarray(w.transpose(2, 1, 0)),
                "bias": sd[f"{prefix}.conv.bias"]}

    def res_block(prefix: str) -> Dict:
        bidx = sorted({int(k.split(".")[4]) for k in sd
                       if k.startswith(f"{prefix}.block.")})
        return {"conv1": wn_conv(f"{prefix}.block.{bidx[0]}"),
                "conv2": wn_conv(f"{prefix}.block.{bidx[1]}"),
                "shortcut": wn_conv(f"{prefix}.shortcut")}

    def lstm_params(prefix: str, layer: int) -> Dict:
        return {
            "weight_ih": sd[f"{prefix}.lstm.weight_ih_l{layer}"].T,
            "weight_hh": sd[f"{prefix}.lstm.weight_hh_l{layer}"].T,
            "bias_ih": sd[f"{prefix}.lstm.bias_ih_l{layer}"],
            "bias_hh": sd[f"{prefix}.lstm.bias_hh_l{layer}"],
        }

    params: Dict = {"encoder": {}, "decoder": {}, "quantizer": {}}

    convs, blocks, lstms = classify("encoder")
    enc = params["encoder"]
    enc["conv_in"] = wn_conv(convs[0])
    enc["conv_out"] = wn_conv(convs[-1])
    for i, p in enumerate(convs[1:-1]):
        enc[f"down{i}"] = wn_conv(p)
    for i, p in enumerate(blocks):
        enc[f"res{i}"] = res_block(p)
    for l in range(2):
        enc[f"lstm{l}"] = lstm_params(lstms[0], l)

    convs, blocks, lstms = classify("decoder")
    dec = params["decoder"]
    dec["conv_in"] = wn_conv(convs[0])
    dec["conv_out"] = wn_conv(convs[-1])
    for i, p in enumerate(convs[1:-1]):
        w = _encodec_fold_wn(sd, f"{p}.conv")  # convtr [in, out, k]
        dec[f"up{i}_weight"] = np.ascontiguousarray(w.transpose(2, 1, 0))
        dec[f"up{i}_bias"] = sd[f"{p}.conv.bias"]
    for i, p in enumerate(blocks):
        dec[f"res{i}"] = res_block(p)
    for l in range(2):
        dec[f"lstm{l}"] = lstm_params(lstms[0], l)

    n_q = 1 + max(int(k.split(".")[2]) for k in sd
                  if k.startswith("quantizer.layers."))
    params["quantizer"]["codebooks"] = np.stack(
        [sd[f"quantizer.layers.{q}.codebook.embed"] for q in range(n_q)]
    )
    return {"params": params}


# --------------------------------------------------------------------------
# Converter-drift guard: which checkpoint entries did a conversion consume?
# --------------------------------------------------------------------------


class TrackingStateDict(dict):
    """dict that records every key read through it (SDView.get indexes the
    underlying dict, so any converter run on this records its consumption)."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        super().__init__(sd)
        self.accessed: set = set()

    def __getitem__(self, key):
        self.accessed.add(key)
        return super().__getitem__(key)


_COVERAGE_IGNORE = ("num_batches_tracked", ".weight_orig", ".weight_u",
                    ".weight_v", "cluster_size", "embed_avg", ".inited",
                    ".kernel", "noises.noise")  # blur/noise buffers


def conversion_coverage(convert_fn, sd: Dict[str, np.ndarray], *args,
                        ignore=_COVERAGE_IGNORE, **kwargs):
    """Run a converter and report checkpoint entries it never read.

    A non-empty result usually means the torch model gained parameters the
    converter silently drops — the drift this guards against. Entries whose
    names contain an ``ignore`` fragment (optimizer/EMA bookkeeping,
    spectral-norm raw triples consumed via other keys) are excluded.

    Returns (converted, leftover_keys)."""
    tracked = TrackingStateDict(sd)
    out = convert_fn(tracked, *args, **kwargs)
    leftover = sorted(
        k for k in sd
        if k not in tracked.accessed and not any(s in k for s in ignore)
    )
    return out, leftover


def convert_retinaface_mnet(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """mobilenet0.25 RetinaFace checkpoint (cfg_mnet) -> flax variables.

    Body keys: body.stage{s}.{i}.{j} where conv_bn blocks are [conv, bn] and
    conv_dw blocks are [dw conv, bn, relu, pw conv, bn, relu] (net.py:9-38).
    FPN/SSH/head keys are identical to the R50 layout."""
    v = SDView(sd, prefix)
    bb = v.sub("body")

    def conv_dw(view: SDView) -> Dict:
        dw_bn_p, dw_bn_s = view.bn("1")
        pw_bn_p, pw_bn_s = view.bn("4")
        return {
            "dw": view.conv("0", bias=False),
            "dw_bn": dw_bn_p, "dw_bn__stats": dw_bn_s,
            "pw": view.conv("3", bias=False),
            "pw_bn": pw_bn_p, "pw_bn__stats": pw_bn_s,
        }

    tree: Dict = {"stage1_0": _convbn(bb.sub("stage1.0"))}
    for i in range(1, 6):
        tree[f"stage1_{i}"] = conv_dw(bb.sub(f"stage1.{i}"))
    for i in range(6):
        tree[f"stage2_{i}"] = conv_dw(bb.sub(f"stage2.{i}"))
    for i in range(2):
        tree[f"stage3_{i}"] = conv_dw(bb.sub(f"stage3.{i}"))

    fpn = v.sub("fpn")
    tree["fpn"] = {
        name: _convbn(fpn.sub(name))
        for name in ("output1", "output2", "output3", "merge1", "merge2")
    }
    for i in (1, 2, 3):
        ssh = v.sub(f"ssh{i}")
        tree[f"ssh{i}"] = {
            name: _convbn(ssh.sub(name))
            for name in ("conv3X3", "conv5X5_1", "conv5X5_2", "conv7X7_2", "conv7x7_3")
        }
    for i in range(3):
        tree[f"BboxHead{i}"] = v.conv(f"BboxHead.{i}.conv1x1")
        tree[f"ClassHead{i}"] = v.conv(f"ClassHead.{i}.conv1x1")
        tree[f"LandmarkHead{i}"] = v.conv(f"LandmarkHead.{i}.conv1x1")

    params, stats = _split_stats(tree)
    body_p = {k: params.pop(k) for k in list(params) if k.startswith("stage")}
    body_s = {k: stats.pop(k) for k in list(stats) if k.startswith("stage")}
    params["body"] = body_p
    stats["body"] = body_s
    return {"params": params, "batch_stats": stats}


def convert_irse(sd: Dict[str, np.ndarray], num_layers: int = 50,
                 prefix: str = "") -> Dict:
    """model_ir_se50.pth (GPEN training/loss/model_irse.py Backbone ir_se)
    -> s2v_tpu.models.irse.BackboneIRSE variables."""
    from s2v_tpu.models.irse import _blocks

    v = SDView(sd, prefix)
    params: Dict = {}
    stats: Dict = {}

    inp = v.sub("input_layer")
    bn_p, bn_s = inp.bn("1")
    params["input_conv"] = inp.conv("0", bias=False)
    params["input_bn"] = bn_p
    stats["input_bn"] = bn_s
    params["input_prelu"] = {"alpha": inp.get("2.weight")}

    for i, (cin, depth, stride) in enumerate(_blocks(num_layers)):
        blk = v.sub(f"body.{i}")
        res = blk.sub("res_layer")
        bn1_p, bn1_s = res.bn("0")
        bn2_p, bn2_s = res.bn("4")
        p: Dict = {
            "bn1": bn1_p,
            "conv1": res.conv("1", bias=False),
            "prelu": {"alpha": res.get("2.weight")},
            "conv2": res.conv("3", bias=False),
            "bn2": bn2_p,
        }
        s: Dict = {"bn1": bn1_s, "bn2": bn2_s}
        if f"res_layer.5.fc1.weight" in blk:
            p["se"] = {"fc1": res.conv("5.fc1", bias=False),
                       "fc2": res.conv("5.fc2", bias=False)}
        if cin != depth:
            sc_bn_p, sc_bn_s = blk.bn("shortcut_layer.1")
            p["shortcut_conv"] = blk.conv("shortcut_layer.0", bias=False)
            p["shortcut_bn"] = sc_bn_p
            s["shortcut_bn"] = sc_bn_s
        params[f"body{i}"] = p
        stats[f"body{i}"] = s

    out = v.sub("output_layer")
    obn_p, obn_s = out.bn("0")
    params["output_bn"] = obn_p
    stats["output_bn"] = obn_s
    lin = out.linear("3")
    params["linear_weight"] = lin["weight"]
    params["linear_bias"] = lin["bias"]
    params["head_weight"] = out.get("4.weight")
    params["head_bias"] = out.get("4.bias")
    stats["head_mean"] = out.get("4.running_mean")
    stats["head_var"] = out.get("4.running_var")
    return {"params": params, "batch_stats": stats}


def convert_mobilefacenet(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """arcface mobilefacenet checkpoint -> s2v_tpu MobileFaceNet variables
    (backbones/mobilefacenet.py:90-120 key layout: nested .layers
    Sequentials)."""
    v = SDView(sd, prefix)

    def conv_block(view: SDView):
        bn_p, bn_s = view.bn("layers.1")
        return ({"conv": view.conv("layers.0", bias=False), "bn": bn_p,
                 "prelu": {"alpha": view.get("layers.2.weight")}},
                {"bn": bn_s})

    def linear_block(view: SDView):
        bn_p, bn_s = view.bn("layers.1")
        return ({"conv": view.conv("layers.0", bias=False), "bn": bn_p},
                {"bn": bn_s})

    def depthwise(view: SDView):
        pw_p, pw_s = conv_block(view.sub("layers.0"))
        dw_p, dw_s = conv_block(view.sub("layers.1"))
        pj_p, pj_s = linear_block(view.sub("layers.2"))
        return ({"pw": pw_p, "dw": dw_p, "proj": pj_p},
                {"pw": pw_s, "dw": dw_s, "proj": pj_s})

    params: Dict = {}
    stats: Dict = {}
    residual_blocks = {3: 4, 5: 6, 7: 2}
    for i in range(8):
        view = v.sub(f"layers.{i}")
        if i in (0, 1):
            params[f"l{i}"], stats[f"l{i}"] = conv_block(view)
        elif i in residual_blocks:
            for j in range(residual_blocks[i]):
                name = f"l{i}_{j}"
                params[name], stats[name] = depthwise(view.sub(f"layers.{j}"))
        else:
            params[f"l{i}"], stats[f"l{i}"] = depthwise(view)
    params["conv_sep"], stats["conv_sep"] = conv_block(v.sub("conv_sep"))
    params["gdc_dw"], stats["gdc_dw"] = linear_block(
        v.sub("features.layers.0"))
    params["gdc_weight"] = np.transpose(v.get("features.layers.2.weight"))
    out = v.sub("features.layers.3")
    params["head_weight"] = out.get("weight")
    params["head_bias"] = out.get("bias")
    stats["head_mean"] = out.get("running_mean")
    stats["head_var"] = out.get("running_var")
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------
# GFPGANv1 (original arch, gfpganv1_arch.py — basicsr StyleGAN2 key names)
# --------------------------------------------------------------------------

def _bsr_styledconv(v: SDView) -> Dict:
    """basicsr StyleConv: modulated_conv + scalar noise `weight` + activate."""
    return {
        "conv": _gpen_modconv(v.sub("modulated_conv")),
        "noise_weight": v.get("weight").reshape(-1),
        "act_bias": v.get("activate.bias"),
    }


def _bsr_torgb(v: SDView) -> Dict:
    return {
        "conv": _gpen_modconv(v.sub("modulated_conv")),
        "bias": v.get("bias").reshape(-1),
    }


def _conv_up_layer(v: SDView, activate: bool = True) -> Dict:
    out = {"conv": {"weight": np.transpose(v.get("weight"), (2, 3, 1, 0))}}
    if activate:
        out["act_bias"] = v.get("activation.bias")
    return out


def convert_gfpgan_v1(sd: Dict[str, np.ndarray], out_size: int = 512,
                      num_mlp: int = 8, prefix: str = "") -> Dict:
    """GFPGANv1.pth ('params_ema'/'params' dict, original basicsr arch)
    -> s2v_tpu.models.gfpgan.GFPGANv1 variables."""
    import math

    v = SDView(sd, prefix)
    log_size = int(math.log2(out_size))
    params: Dict = {
        "conv_body_first": _gpen_convlayer(v.sub("conv_body_first"),
                                           downsample=False),
        "final_conv": _gpen_convlayer(v.sub("final_conv"), downsample=False),
        "final_linear": v.linear("final_linear"),
    }
    for i in range(log_size - 2):
        blk = v.sub(f"conv_body_down.{i}")
        params[f"conv_body_down{i}"] = {
            "conv1": _gpen_convlayer(blk.sub("conv1"), downsample=False),
            "conv2": _gpen_convlayer(blk.sub("conv2"), downsample=True),
            "skip": _gpen_convlayer(blk.sub("skip"), downsample=True),
        }
        up = v.sub(f"conv_body_up.{i}")
        params[f"conv_body_up{i}"] = {
            "conv1": _gpen_convlayer(up.sub("conv1"), downsample=False),
            "conv2": _conv_up_layer(up.sub("conv2")),
            "skip": _conv_up_layer(up.sub("skip"), activate=False),
        }
        for kind in ("scale", "shift"):
            seq = v.sub(f"condition_{kind}.{i}")
            params[f"condition_{kind}{i}_0"] = seq.conv("0")
            params[f"condition_{kind}{i}_1"] = seq.conv("2")
        params[f"toRGB{i}"] = v.conv(f"toRGB.{i}")

    dec = v.sub("stylegan_decoder")
    d: Dict = {
        "constant_input": dec.get("constant_input.weight").transpose(0, 2, 3, 1),
        "style_conv1": _bsr_styledconv(dec.sub("style_conv1")),
        "to_rgb1": _bsr_torgb(dec.sub("to_rgb1")),
    }
    for i in range(num_mlp):
        d[f"style{i}"] = dec.linear(f"style_mlp.{i + 1}")
    for k in range(2 * (log_size - 2)):
        d[f"style_convs{k}"] = _bsr_styledconv(dec.sub(f"style_convs.{k}"))
    for k in range(log_size - 2):
        d[f"to_rgbs{k}"] = _bsr_torgb(dec.sub(f"to_rgbs.{k}"))
    params["stylegan_decoder"] = d
    return {"params": params}


def convert_resnet_depth(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """FAN depth checkpoint (face_detection/models.py ResNetDepth) -> flax
    variables for s2v_tpu.models.resnet.ResNetDepth."""
    v = SDView(sd, prefix)
    tree: Dict = {"conv1": v.conv("conv1", bias=False)}
    bn_p, bn_s = v.bn("bn1")
    tree["bn1"] = bn_p
    tree["bn1__stats"] = bn_s
    for stage, n in enumerate((3, 8, 36, 3)):
        for b in range(n):
            tree[f"layer{stage + 1}_{b}"] = _bottleneck(
                v.sub(f"layer{stage + 1}.{b}")
            )
    params, stats = _split_stats(tree)
    lin = v.linear("fc")
    return {"params": {"backbone": params,
                       "fc_weight": lin["weight"], "fc_bias": lin["bias"]},
            "batch_stats": {"backbone": stats}}
