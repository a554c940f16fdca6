"""16-frame WHOLE-pipeline parity: the reference's torch models + host
geometry (facing.py Steps 1-3 + inference.py datagen/Step 6) against the
s2v_tpu pipeline, on identical synthesized weights, identical injected
landmarks/boxes, identical mel chunks — comparing per-frame outputs at the
three cross-stage seams per VERDICT r2 item 7:

  stabilized   Step 1->2->3: FFHQ crop -> align_img -> ReconNet -> coeff
               windows/expression hack -> DNet         (facing.py:74-198)
  refs         datagen: STIT quad crop -> perspective paste -> box crop
               (inference.py:341-367)
  final        Step 6: mask/concat -> ENet -> box paste (inference.py:259-297)

Restoration hooks are OFF on both sides (their parity is per-stage in
parity_harness.py). Host-CV stand-ins on the torch side, documented:

- cv2.resize(INTER_LINEAR) -> s2v_tpu.io.native.crop_resize_u8f32 (validated
  against cv2 bilinear conventions in tests/test_ops_vs_torch.py) — no cv2
  ships in this image.
- torchvision.transforms.functional -> a real mini-implementation (resize/
  to_tensor/normalize) sufficient for trans_image (inference_utils.py:66-71).

    PYTHONPATH=/root/repo python tools/make_synth_ckpts.py      # once
    PYTHONPATH=/root/repo python tools/parity_pipeline.py       # ~10 min

Writes/merges the 'pipeline_chain' section of PARITY_<S2V_ROUND>.json.
"""

import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from make_synth_ckpts import _install_stubs, REF  # noqa: E402

CKPTS = os.environ.get("S2V_CKPTS", "/tmp/ckpts")
N, H, W = 16, 160, 144
PADS = (0, 20, 0, 0)  # the reference --pads default (jaw_correction path)


# ---------------------------------------------------------------------------
# stubs for the reference's host-CV imports
# ---------------------------------------------------------------------------


def _resize_cv(img: np.ndarray, wh) -> np.ndarray:
    """cv2.resize(img, (w, h), INTER_LINEAR) stand-in via the native
    cv2-convention bilinear resizer."""
    from s2v_tpu.io.native import crop_resize_u8f32

    w, h = wh
    u8 = np.ascontiguousarray(np.clip(img, 0, 255).astype(np.uint8))
    hh, ww = u8.shape[:2]
    out = crop_resize_u8f32(u8, (0, hh, 0, ww), (h, w), scale=1.0)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _install_ref_host_stubs():
    _install_stubs()
    # numpy 2 removed these aliases the reference still references
    if not hasattr(np, "VisibleDeprecationWarning"):
        np.VisibleDeprecationWarning = DeprecationWarning
    if not hasattr(np, "float"):
        np.float = float
        np.int = int
        np.bool = bool
        np.object = object
    if "cv2" not in sys.modules:
        cv2 = types.ModuleType("cv2")
        cv2.resize = lambda img, wh, **kw: _resize_cv(img, wh)
        cv2.INTER_LINEAR = 1
        cv2.imwrite = lambda *a, **k: True
        sys.modules["cv2"] = cv2
    if "dlib" not in sys.modules:
        sys.modules["dlib"] = types.ModuleType("dlib")
    if "face_alignment" not in sys.modules:
        fa = types.ModuleType("face_alignment")

        class _LT:
            _2D = "2D"

        class _FA:  # constructed by crop_faces(use_fa=True); never called
            def __init__(self, *a, **k):
                pass

        fa.LandmarksType = _LT
        fa.FaceAlignment = _FA
        sys.modules["face_alignment"] = fa
    for name in ("skimage", "skimage.io", "skimage.transform"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name.endswith("transform"):
                mod.SimilarityTransform = object
            sys.modules[name] = mod
    if "torchvision" not in sys.modules:
        import torch
        from PIL import Image

        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        tf = types.ModuleType("torchvision.transforms.functional")

        def resize(img, size, interpolation=None):
            if isinstance(size, int):  # shorter side -> size, keep aspect
                w, h = img.size
                if min(w, h) == size:
                    return img
                if w < h:
                    return img.resize((size, int(round(h * size / w))),
                                      Image.BICUBIC)
                return img.resize((int(round(w * size / h)), size),
                                  Image.BICUBIC)
            return img.resize(size[::-1], Image.BICUBIC)

        def to_tensor(img):
            arr = np.asarray(img, np.float32) / 255.0
            return torch.from_numpy(arr.transpose(2, 0, 1).copy())

        def normalize(t, mean, std):
            mean = torch.tensor(mean).view(-1, 1, 1)
            std = torch.tensor(std).view(-1, 1, 1)
            return (t - mean) / std

        tf.resize, tf.to_tensor, tf.normalize = resize, to_tensor, normalize
        tr.functional = tf
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
        sys.modules["torchvision.transforms.functional"] = tf


# ---------------------------------------------------------------------------
# shared inputs
# ---------------------------------------------------------------------------


def synthetic_lms(tag: str, n: int, h: int, w: int) -> np.ndarray:
    """Deterministic plausible 68-point landmarks keyed by stage tag — the
    SAME arrays are injected on both sides, so landmark estimation cancels
    and the comparison isolates the geometry + model chain."""
    from bench import _synthetic_landmarks

    lm = _synthetic_landmarks(n, h, w)
    jit = np.random.RandomState(abs(hash(tag)) % (2**31))
    return (lm + jit.randn(n, 1, 2).astype(np.float32) * 0.8).astype(
        np.float32)


def raw_boxes(n: int, h: int, w: int) -> np.ndarray:
    """Injected integer detector boxes (x1, y1, x2, y2) with mild drift."""
    cx, cy, s = w // 2, h // 2, int(min(h, w) * 0.3)
    drift = (np.arange(n) % 3) - 1
    return np.stack([
        np.full(n, cx - s) + drift, np.full(n, cy - s),
        np.full(n, cx + s) + drift, np.full(n, cy + s)], 1).astype(np.int64)


# ---------------------------------------------------------------------------
# reference (torch) side
# ---------------------------------------------------------------------------


def run_reference(frames: np.ndarray, mel_chunks: np.ndarray):
    import torch

    from s2v_tpu.utils import weights as Wt

    _install_ref_host_stubs()
    for p in (REF, f"{REF}/third_part"):
        if p not in sys.path:
            sys.path.insert(0, p)
    from futils.ffhq_preprocess import Croper
    from futils.alignment_stit import (
        calc_alignment_coefficients, crop_faces, paste_image,
    )
    from futils import inference_utils as IU
    from face3d.util.load_mats import load_lm3d
    from face3d.util import preprocess as REF_PRE

    class _NpShim:
        """numpy-1 ragged np.array behavior for the reference's
        trans_params = np.array([w0, h0, s, t[0], t[1]]) (preprocess.py:196)
        where t entries are 1-element arrays — numpy 2 raises; the old
        object-array path reduced to the same 5 floats."""

        def __getattr__(self, k):
            return getattr(np, k)

        def array(self, obj, *a, **k):
            try:
                return np.array(obj, *a, **k)
            except ValueError:
                return np.array([np.asarray(x).reshape(-1)[0]
                                 if np.ndim(x) else x for x in obj], *a, **k)

    REF_PRE.np = _NpShim()
    align_img = REF_PRE.align_img
    from face3d.models import networks
    from models.DNet import DNet as RefDNet
    from models.LNet import LNet as RefLNet
    from models.ENet import ENet as RefENet
    from PIL import Image
    from scipy.io import loadmat

    def t_in(sd):
        return {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}

    n = len(frames)
    # ---- Step 1 (facing.py:74-86): first-frame FFHQ quad on all frames
    lm_full = synthetic_lms("full", n, H, W)
    crop, quad = Croper.align_face(
        None, Image.fromarray(frames[0]), lm_full[0].astype(np.float64), 512)
    clx, cly, crx, cry = crop
    lx, ly, rx, ry = [int(v) for v in quad]
    oy1 = cly + ly
    oy2 = min(cly + ry, frames[0].shape[0])
    ox1 = clx + lx
    ox2 = min(clx + rx, frames[0].shape[1])
    cropped = [f[cly:cry, clx:crx][ly:ry, lx:rx] for f in frames]
    frames_256 = [_resize_cv(f, (256, 256)) for f in cropped]

    # ---- Step 2 (facing.py:99-133)
    lm3d_std = load_lm3d(f"{CKPTS}/BFM")
    sd = Wt.load_torch_checkpoint(f"{CKPTS}/face3d_pretrain_epoch_20.pth",
                                  key="net_recon")
    net_recon = networks.ReconNetWrapper("resnet50", use_last_fc=False).eval()
    net_recon.load_state_dict(t_in(sd))
    lm_256 = synthetic_lms("crop256", n, 256, 256)
    video_coeffs = []
    for i in range(n):
        pil = Image.fromarray(frames_256[i])
        lm_i = lm_256[i].copy()
        lm_i[:, -1] = 256 - 1 - lm_i[:, -1]
        trans_params, im_i, _, _ = align_img(pil, lm_i, lm3d_std)
        trans_params = np.array(
            [float(x) for x in np.hsplit(trans_params, 5)], np.float32)
        im_t = torch.tensor(np.array(im_i) / 255.0, dtype=torch.float32
                            ).permute(2, 0, 1).unsqueeze(0)
        with torch.no_grad():
            coeffs = IU.split_coeff(net_recon(im_t))
        pc = {k: v.cpu().numpy() for k, v in coeffs.items()}
        video_coeffs.append(np.concatenate(
            [pc["id"], pc["exp"], pc["tex"], pc["angle"], pc["gamma"],
             pc["trans"], trans_params[None]], 1))
    semantic = np.array(video_coeffs)[:, 0]

    # ---- Step 3 (facing.py:135-198)
    expression = torch.tensor(
        loadmat(f"{CKPTS}/expression.mat")["expression_center"])[0]
    dnet = RefDNet().eval()
    dnet.load_state_dict(t_in(Wt.load_torch_checkpoint(
        f"{CKPTS}/DNet.pt", key="net_G_ema")))
    stabilized = []
    for idx in range(n):
        source_img = IU.trans_image(
            Image.fromarray(frames_256[idx])).unsqueeze(0)
        ratio = IU.find_crop_norm_ratio(semantic[idx:idx + 1], semantic)
        coeff = IU.transform_semantic(semantic, idx, ratio).unsqueeze(0)
        coeff[:, :64, :] = expression[None, :64, None]
        with torch.no_grad():
            output = dnet(source_img, coeff)
        stabilized.append(np.uint8(
            (output["fake_image"].squeeze(0).permute(1, 2, 0)
             .clamp_(-1, 1).numpy() + 1) / 2.0 * 255))
    stabilized = np.stack(stabilized)

    # ---- datagen reference construction (inference.py:341-367)
    image_size = 256
    lm_stab = synthetic_lms("stab", n, 256, 256)
    fr_pil = [Image.fromarray(f) for f in stabilized]
    files = [(lm_stab[i].astype(np.float64), fr_pil[i]) for i in range(n)]
    crops, _, quads = crop_faces(image_size, files, scale=1.0, use_fa=True)
    inverse_transforms = [
        calc_alignment_coefficients(
            q + 0.5,
            [[0, 0], [0, image_size], [image_size, image_size],
             [image_size, 0]])
        for q in quads]

    boxes = raw_boxes(n, H, W).copy()
    # face_detect pads + smoothing (inference_utils.py:110-145)
    pady1, pady2, padx1, padx2 = PADS
    results = []
    for (x1, y1, x2, y2), image in zip(boxes, frames):
        results.append([max(0, x1 - padx1), max(0, y1 - pady1),
                        min(image.shape[1], x2 + padx2),
                        min(image.shape[0], y2 + pady2)])
    sboxes = IU.get_smoothened_boxes(np.array(results), T=5)
    face_det_results = [
        [f[y1:y2, x1:x2], (y1, y2, x1, x2)]
        for f, (x1, y1, x2, y2) in zip(frames, sboxes)]

    refs = []
    for inverse_transform, crop_i, full_frame, face_det in zip(
            inverse_transforms, crops, frames, face_det_results):
        imc_pil = paste_image(inverse_transform, crop_i, Image.fromarray(
            _resize_cv(full_frame[oy1:oy2, ox1:ox2], (256, 256))))
        ff = full_frame.copy()
        ff[oy1:oy2, ox1:ox2] = _resize_cv(
            np.array(imc_pil.convert("RGB")), (ox2 - ox1, oy2 - oy1))
        oface, coords = face_det
        y1, y2, x1, x2 = coords
        refs.append(ff[y1:y2, x1:x2])

    # ---- Step 6 (inference.py:259-297), hooks off, idx = i (no mirror)
    lnet = RefLNet().eval()
    lnet.load_state_dict(t_in(Wt.load_torch_checkpoint(f"{CKPTS}/LNet.pth")))
    enet = RefENet(lnet=lnet).eval()
    enet.load_state_dict(t_in(Wt.load_torch_checkpoint(f"{CKPTS}/ENet.pth")))

    img_size = 384
    finals = []
    refs_384 = []
    for i0 in range(0, n, 8):
        img_b, ref_b, mel_b, coords_b = [], [], [], []
        for i in range(i0, min(i0 + 8, n)):
            face = _resize_cv(refs[i], (img_size, img_size))
            oface, coords = face_det_results[i]
            oface = _resize_cv(oface, (img_size, img_size))
            img_b.append(oface)
            ref_b.append(face)
            mel_b.append(mel_chunks[i])
            coords_b.append(coords)
        img_b = np.asarray(img_b)
        ref_b = np.asarray(ref_b)
        refs_384.extend(list(ref_b))
        img_masked = img_b.copy()
        img_masked[:, img_size // 2:] = 0
        inp = np.concatenate((img_masked, ref_b), axis=3) / 255.0
        mel_in = np.asarray(mel_b)[..., None]
        with torch.no_grad():
            t_img = torch.FloatTensor(inp.transpose(0, 3, 1, 2))
            t_mel = torch.FloatTensor(mel_in.transpose(0, 3, 1, 2))
            _, reference = torch.split(t_img, 3, dim=1)
            pred, _ = enet(t_mel, t_img, reference)
            pred = torch.clamp(pred, 0, 1)
        pred = pred.cpu().numpy().transpose(0, 2, 3, 1) * 255.0
        for p, i in zip(pred, range(i0, min(i0 + 8, n))):
            y1, y2, x1, x2 = face_det_results[i][1]
            p = _resize_cv(p.astype(np.uint8), (x2 - x1, y2 - y1))
            ff = frames[i].copy()
            ff[y1:y2, x1:x2] = p
            finals.append(ff)

    return {
        "coordinates": (oy1, oy2, ox1, ox2),
        "stabilized": stabilized,
        "refs_384": np.stack(refs_384),
        "final": np.stack(finals),
        "boxes": np.asarray(sboxes),
    }


# ---------------------------------------------------------------------------
# s2v_tpu (jax) side
# ---------------------------------------------------------------------------


def run_s2v(frames: np.ndarray, mel: "object"):
    import jax.numpy as jnp

    from s2v_tpu import cli
    from s2v_tpu.pipeline.inference import LipSyncPipeline

    cfg = cli.parse_args([
        "--checkpoint_dir", CKPTS, "--tmp_dir", "/tmp/parity_chain_tmp",
        "--lnet_batch_size", "8", "--re_preprocess",
        "--pads", *[str(p) for p in PADS],
        "--model.dtype", "float32",
    ])
    models = cli.load_models(CKPTS, cfg)
    models.ref_enhancer = None
    models.mouth_restorer = None
    models.final_enhancer = None
    pipe = LipSyncPipeline(cfg, models)

    n = len(frames)
    lm_by_tag = {
        (H, W): synthetic_lms("full", n, H, W),
        (256, 256): synthetic_lms("crop256", n, 256, 256),
    }
    stab_seen = {"done": False}

    def fake_landmarks(fr, batch=8, return_boxes=False):
        key = fr.shape[1:3]
        if key == (256, 256) and stab_seen["done"]:
            lms = synthetic_lms("stab", len(fr), 256, 256)
        else:
            lms = lm_by_tag[key][: len(fr)]
        bx = raw_boxes(len(fr), *key).astype(np.float32)
        return (lms, bx) if return_boxes else lms

    pipe.extract_landmarks = fake_landmarks
    pipe.detect_boxes = lambda fr, batch=8: raw_boxes(
        len(fr), *fr.shape[1:3]).astype(np.float32)

    lm_full = fake_landmarks(frames)
    frames_256, coordinates = pipe.ffhq_crop(frames, lm_full[0])
    semantic = pipe.extract_coeffs(frames_256,
                                   fake_landmarks(frames_256))
    stabilized = pipe.stabilize(frames_256, semantic)
    stab_seen["done"] = True  # datagen's landmark pass sees 'stab' lms

    from s2v_tpu.models.s3fd import pad_and_smooth_boxes

    boxes_sm = np.asarray(pad_and_smooth_boxes(
        jnp.asarray(raw_boxes(n, H, W).astype(np.float32)),
        frames.shape[1:3], pads=cfg.infer.pads, smooth=True)
    ).astype(np.int32)
    refs = np.asarray(pipe.build_reference_faces(
        stabilized, jnp.asarray(frames), coordinates, boxes_sm))
    out = pipe.synthesize(stabilized, mel, frames, coordinates, fps=25.0,
                          boxes_full=raw_boxes(n, H, W).astype(np.float32))
    return {
        "coordinates": coordinates,
        "stabilized": stabilized,
        "refs_384": np.clip(refs, 0, 255).astype(np.uint8),
        "final": out[:n],
    }


def _per_frame(ref_arr: np.ndarray, got_arr: np.ndarray):
    out = []
    for a, b in zip(np.asarray(ref_arr, np.float64),
                    np.asarray(got_arr, np.float64)):
        d = np.abs(a - b)
        mse = float(np.mean(d * d))
        psnr = 200.0 if mse == 0 else min(
            10.0 * np.log10(255.0 ** 2 / mse), 200.0)
        out.append({"max_abs": float(d.max()), "psnr_db": round(psnr, 2)})
    return out


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import wave

    import jax.numpy as jnp

    from s2v_tpu.audio import mel_chunks_for_frames, melspectrogram
    from s2v_tpu.io.audio_io import load_wav

    rs = np.random.RandomState(5)
    base = rs.rand(1, H, W, 3)
    drift = rs.rand(N, 1, 1, 3) * 0.1
    frames = ((base + drift) / 1.1 * 255).astype(np.uint8)

    t = np.arange(int((N + 4) / 25.0 * 16000)) / 16000.0
    pcm = (np.sin(2 * np.pi * 220 * t) * 0.4 * 32767).astype(np.int16)
    with wave.open("/tmp/parity_chain.wav", "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(16000)
        wv.writeframes(pcm.tobytes())
    wav = load_wav("/tmp/parity_chain.wav", 16000)
    mel = melspectrogram(jnp.asarray(wav))
    chunks = np.asarray(mel_chunks_for_frames(mel, N, 25.0))

    t0 = time.time()
    got = run_s2v(frames, mel)
    t_jax = time.time() - t0
    t0 = time.time()
    want = run_reference(frames, chunks)
    t_ref = time.time() - t0

    assert want["coordinates"] == tuple(got["coordinates"]), (
        want["coordinates"], got["coordinates"])
    n_out = min(len(want["final"]), len(got["final"]))
    section = {
        "frames": int(n_out),
        "weights": "synthesized random-init, identical both sides",
        "hooks": "restoration off both sides (per-stage parity covers them)",
        "coordinates_equal": True,
        "wall_s": {"s2v": round(t_jax, 1), "reference": round(t_ref, 1)},
        "per_frame": {
            "stabilized": _per_frame(want["stabilized"], got["stabilized"]),
            "refs_384": _per_frame(want["refs_384"], got["refs_384"]),
            "final": _per_frame(want["final"][:n_out], got["final"][:n_out]),
        },
    }
    for k, v in section["per_frame"].items():
        worst = min(m["psnr_db"] for m in v)
        print(f"{k}: worst per-frame psnr {worst} dB, "
              f"max_abs {max(m['max_abs'] for m in v)}")
    tag = os.environ.get("S2V_ROUND", "r03")
    path = os.path.join(REPO, f"PARITY_{tag}.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data["pipeline_chain"] = section
    if "pipeline_output" in data:
        data["pipeline_output"]["frames"] = int(n_out)
        data["pipeline_output"]["note"] = (
            "see pipeline_chain: 16-frame torch-vs-jax whole-pipeline "
            "comparison with per-frame metrics")
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
