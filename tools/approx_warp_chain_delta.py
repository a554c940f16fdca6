"""Measure the opt-in ``model.approx_warp`` quality delta on the 16-frame
whole-pipeline chain (verdict r3 item 9: "flag + measured delta").

Drives ``LipSyncPipeline.run`` twice on identical synthesized production
checkpoints, identical injected landmarks/boxes and the identical synthetic
clip — once on the exact gather-warp path (the parity surface) and once
with ``model.approx_warp=1`` (sheared separable warps in the GPEN-512
Step-5 enhancer, the GFPGAN mouth tail and — since the round-5 affine
re-derivation — the reffaces quad/paste warps; the core pipeline's
axis-aligned crops are separable-exact either way, ops/warp.py:340-380) —
then records per-frame PSNR between the two finals into
PARITY_<S2V_ROUND>.json.

The GPEN-2048+SR final stage is left OFF (checkpoints filtered): its warps
are the same ``affine_warp`` call sites at 4x the resolution, and a CPU run
of 2048^2 GPEN on this 1-core box costs ~40 min/run; the mechanism under
measurement is identical.

    PYTHONPATH=/root/repo python tools/make_synth_ckpts.py   # once
    PYTHONPATH=/root/repo python tools/approx_warp_chain_delta.py
"""

import json
import os
import shutil
import sys
import time
import wave

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from parity_pipeline import raw_boxes, synthetic_lms  # noqa: E402


def _rotated_lms(tag: str, n: int, h: int, w: int) -> np.ndarray:
    """synthetic_lms plus a per-frame in-plane head roll of up to ~6 deg.

    The stock synthetic landmarks are perfectly upright, so the umeyama
    similarity to REFERENCE_FACIAL_POINTS comes out rotation-free and the
    sheared-separable decomposition is EXACT (the r5 first run recorded
    max_abs=0 — a degenerate measurement). Rolling the landmark cloud
    around its centroid puts real rotation (hence real shear + per-row
    residual shifts) into every Step-5 / mouth-tail warp this tool is
    supposed to measure.
    """
    lm = synthetic_lms(tag, n, h, w)
    ang = np.deg2rad(np.linspace(-6.0, 6.0, n, dtype=np.float32))
    c = lm.mean(axis=1, keepdims=True)
    cos, sin = np.cos(ang)[:, None], np.sin(ang)[:, None]
    x, y = lm[..., 0] - c[..., 0], lm[..., 1] - c[..., 1]
    out = np.stack([cos * x - sin * y, sin * x + cos * y], axis=-1) + c
    return out.astype(np.float32)
from s2v_tpu.utils.jitcache import enable_persistent_cache

enable_persistent_cache()


CKPTS = os.environ.get("S2V_CKPTS", "/tmp/ckpts")
N, H, W = 16, 160, 144
# final-stage checkpoints excluded (see module docstring)
EXCLUDE = ("GPEN-BFR-2048.pth", "realesrnet_x2.pth")


def _filtered_ckpts(src: str) -> str:
    dst = "/tmp/approx_delta_ckpts"
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    os.makedirs(dst)
    for name in os.listdir(src):
        if name in EXCLUDE or name == "clip":
            continue
        os.symlink(os.path.join(src, name), os.path.join(dst, name))
    return dst


def _write_clip(tmp: str):
    rng = np.random.RandomState(7)
    frames = (rng.rand(N, H, W, 3) * 255).astype(np.uint8)
    clip = os.path.join(tmp, "clip.npz")
    np.savez(clip, frames=frames, fps=25.0)
    wav = os.path.join(tmp, "speech.wav")
    sr = 16000
    t = np.arange(int(sr * N / 25.0)) / sr
    pcm = (np.sin(2 * np.pi * 220 * t) * 0.4 * 32767).astype(np.int16)
    with wave.open(wav, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return clip, wav


def _run(ckpt_dir: str, clip: str, wav: str, approx: bool) -> np.ndarray:
    from s2v_tpu import cli
    from s2v_tpu.io.video_io import VideoReader
    from s2v_tpu.pipeline.inference import LipSyncPipeline

    tag = "approx" if approx else "exact"
    tmp = f"/tmp/approx_delta_tmp_{tag}"
    args = [
        "--checkpoint_dir", ckpt_dir, "--tmp_dir", tmp,
        "--lnet_batch_size", "8", "--re_preprocess",
        "--model.dtype", "float32",
        # With synthesized (random-init) weights the RetinaFace landmark
        # head collapses to a point, so detector-driven umeyama transforms
        # come out with scale ~4e-8 — BOTH warp paths then emit the same
        # degenerate constant and the delta measures nothing (max_abs=0,
        # observed twice in r5). reuse_detections threads the injected
        # FAN landmarks (rotation-bearing, _rotated_lms) into the Step-5 /
        # mouth-tail umeyama instead — real similarity warps, and also the
        # production round-5 knob configuration.
        "--model.reuse_detections", "true",
    ]
    if approx:
        args += ["--model.approx_warp", "true"]
    cfg = cli.parse_args(args)
    assert cfg.model.approx_warp is approx
    models = cli.load_models(ckpt_dir, cfg)
    assert models.ref_enhancer is not None, "GPEN-512 hook missing"
    assert models.mouth_restorer is not None, "mouth tail hook missing"
    assert models.final_enhancer is None, "final stage should be filtered"
    pipe = LipSyncPipeline(cfg, models)

    lm_by_tag = {
        (H, W): _rotated_lms("full", N, H, W),
        (256, 256): _rotated_lms("crop256", N, 256, 256),
    }
    stab_seen = {"done": False}

    def fake_landmarks(fr, batch=8, return_boxes=False):
        key = fr.shape[1:3]
        if key == (256, 256) and stab_seen["done"]:
            lms = _rotated_lms("stab", len(fr), 256, 256)
        else:
            lms = lm_by_tag[key][: len(fr)]
        bx = raw_boxes(len(fr), *key).astype(np.float32)
        stab_seen["done"] = stab_seen["done"] or key == (256, 256)
        return (lms, bx) if return_boxes else lms

    pipe.extract_landmarks = fake_landmarks
    pipe.detect_boxes = lambda fr, batch=8: raw_boxes(
        len(fr), *fr.shape[1:3]).astype(np.float32)

    out = os.path.join(tmp, "out.npz")
    t0 = time.time()
    path = pipe.run(clip, wav, out)
    dt = time.time() - t0
    got = VideoReader(path).read_all()
    print(f"{tag}: {got.shape} in {dt:.0f}s", flush=True)
    return got


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float(200.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse))


def main():
    ckpt_dir = _filtered_ckpts(CKPTS)
    tmp = "/tmp/approx_delta_clip"
    os.makedirs(tmp, exist_ok=True)
    clip, wav = _write_clip(tmp)

    exact = _run(ckpt_dir, clip, wav, approx=False)
    approx = _run(ckpt_dir, clip, wav, approx=True)
    per_frame = [psnr(exact[i], approx[i]) for i in range(len(exact))]
    d = np.abs(exact.astype(np.int32) - approx.astype(np.int32))
    rec = {
        "psnr_mean": round(float(np.mean(per_frame)), 2),
        "psnr_worst": round(float(np.min(per_frame)), 2),
        "max_abs": int(d.max()),
        "frac_within_2": round(float((d <= 2).mean()), 4),
        "n_frames": int(len(exact)),
        "stages_on": "gpen512_step5 + gfpgan mouth tail + reffaces "
                     "quad/paste (final 2048 stage "
                     "filtered; same affine_warp call sites, see docstring)",
        "head_roll_deg": "-6..+6 per frame (rotation-bearing umeyama warps; "
                         "upright landmarks make the shear path exact)",
        "geometry": "model.reuse_detections=true on both sides (injected "
                    "FAN landmarks drive the umeyama; synthetic-weight "
                    "RetinaFace geometry is point-degenerate)",
        "weights": "synthesized production-geometry checkpoints "
                   "(tools/make_synth_ckpts.py)",
    }
    print(json.dumps(rec))

    round_tag = os.environ.get("S2V_ROUND", "r04")
    path = os.path.join(REPO, f"PARITY_{round_tag}.json")
    blob = {}
    if os.path.isfile(path):
        with open(path) as f:
            blob = json.load(f)
    blob["approx_warp_chain"] = rec
    with open(path, "w") as f:
        json.dump(blob, f, indent=2)
    print(f"merged into {path}")


if __name__ == "__main__":
    main()
