"""Pipeline parity harness: drive the reference torch models and the s2v_tpu
pipeline on the SAME weights (torch.load of the synthesized checkpoints) and
the SAME inputs, and record per-stage deltas + pipeline-output metrics.

    PYTHONPATH=/root/repo python tools/make_synth_ckpts.py   # once
    PYTHONPATH=/root/repo python tools/parity_harness.py     # -> PARITY_r0N.json

Environment limits (documented in the output): the reference's *host* stage
drivers (inference.py main, facing.py, GPEN face_enhancement.py) import cv2/
librosa/dlib, none of which exist in this image — so stage parity is
measured at each stage's model boundary (the device work), host geometry is
covered by the formula-level tests in tests/ (align/PIL, warps/cv2
conventions), and the audio frontend by librosa-golden tests
(tests/test_audio.py). Weights are synthesized random-init: real-checkpoint
distributions are NOT exercised (no weights ship in this image).

Per stage: max_abs difference and PSNR (dB, over the reference output's
dynamic range). The pipeline-output section runs the full s2v_tpu pipeline
(f32, restoration hooks ON) and reports PSNR vs input + LSE-C/LSE-D via
SyncNet embeddings (pipeline/metrics.py) — harness proof, arbitrary values
under random weights.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

sys.path.insert(0, os.path.join(REPO, "tools"))
from make_synth_ckpts import _install_stubs, _load, REF  # noqa: E402

CKPTS = os.environ.get("S2V_CKPTS", "/tmp/ckpts")
RNG = np.random.RandomState(42)


def _metrics(ref_out: np.ndarray, got: np.ndarray):
    ref_out = np.asarray(ref_out, np.float64)
    got = np.asarray(got, np.float64)
    diff = np.abs(ref_out - got)
    rng = float(ref_out.max() - ref_out.min()) or 1.0
    mse = float(np.mean(diff * diff))
    # cap at 200 dB: strict JSON has no Infinity literal
    psnr = 200.0 if mse == 0 else min(10.0 * np.log10(rng * rng / mse), 200.0)
    return {"max_abs": float(diff.max()), "psnr_db": round(psnr, 2),
            "shape": list(ref_out.shape)}


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    _install_stubs()
    from s2v_tpu.utils import weights as W

    results = {"weights": "synthesized random-init (tools/make_synth_ckpts.py)",
               "dtype": "float32 both sides", "stages": {}}

    def torch_in(x):
        return torch.from_numpy(np.ascontiguousarray(x))

    def jx(tree):
        return jax.tree_util.tree_map(jnp.asarray, tree)

    # ---- Step 2: ReconNet (3DMM coefficient regressor) --------------------
    if f"{REF}/third_part" not in sys.path:
        sys.path.insert(0, f"{REF}/third_part")
    from face3d.models import networks
    from s2v_tpu.models.resnet import ReconNet

    sd = W.load_torch_checkpoint(f"{CKPTS}/face3d_pretrain_epoch_20.pth",
                                 key="net_recon")
    ref = networks.ReconNetWrapper("resnet50", use_last_fc=False).eval()
    ref.load_state_dict({k: torch_in(v) for k, v in sd.items()})
    x = RNG.rand(2, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        want = ref(torch_in(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(ReconNet().apply(jx(W.convert_recon_net(sd)), jnp.asarray(x)))
    results["stages"]["step2_recon_coeffs"] = _metrics(want, got)
    print("step2", results["stages"]["step2_recon_coeffs"], flush=True)

    # ---- Step 3: DNet stabilizer ------------------------------------------
    from models.DNet import DNet as RefDNet
    from s2v_tpu.models import DNet

    sd = W.load_torch_checkpoint(f"{CKPTS}/DNet.pt", key="net_G_ema")
    ref = RefDNet().eval()
    ref.load_state_dict({k: torch_in(v) for k, v in sd.items()})
    img = (RNG.rand(2, 3, 256, 256).astype(np.float32) * 2 - 1)
    coeff = RNG.randn(2, 73, 27).astype(np.float32) * 0.1
    with torch.no_grad():
        want = ref(torch_in(img), torch_in(coeff))["fake_image"].numpy()
    got = np.asarray(DNet().apply(
        jx(W.convert_dnet(sd)), jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(coeff.transpose(0, 2, 1)))["fake_image"]
    ).transpose(0, 3, 1, 2)
    results["stages"]["step3_dnet_fake_image"] = _metrics(want, got)
    print("step3", results["stages"]["step3_dnet_fake_image"], flush=True)

    # ---- Step 6 core: ENet(LNet) ------------------------------------------
    from models.LNet import LNet as RefLNet
    from models.ENet import ENet as RefENet
    from s2v_tpu.models import ENet

    enet_sd = W.load_torch_checkpoint(f"{CKPTS}/ENet.pth")
    lnet_sd = W.load_torch_checkpoint(f"{CKPTS}/LNet.pth")
    ref_lnet = RefLNet().eval()
    ref_lnet.load_state_dict({k: torch_in(v) for k, v in lnet_sd.items()})
    ref = RefENet(lnet=ref_lnet).eval()
    ref.load_state_dict({k: torch_in(v) for k, v in enet_sd.items()})
    audio = RNG.randn(2, 1, 80, 16).astype(np.float32)
    face = RNG.rand(2, 6, 384, 384).astype(np.float32)
    gt = RNG.rand(2, 3, 384, 384).astype(np.float32)
    with torch.no_grad():
        want, want_low = ref(torch_in(audio), torch_in(face), torch_in(gt))
    got, got_low = ENet().apply(
        jx(W.convert_enet(enet_sd, lnet_sd)),
        jnp.asarray(audio.transpose(0, 2, 3, 1)),
        jnp.asarray(face.transpose(0, 2, 3, 1)),
        jnp.asarray(gt.transpose(0, 2, 3, 1)))
    results["stages"]["step6_enet_pred_384"] = _metrics(
        want.numpy(), np.asarray(got).transpose(0, 3, 1, 2))
    results["stages"]["step6_lnet_low_res_96"] = _metrics(
        want_low.numpy(), np.asarray(got_low).transpose(0, 3, 1, 2))
    print("step6", results["stages"]["step6_enet_pred_384"], flush=True)

    # ---- Step 5 / final: GPEN FullGenerator 512 ---------------------------
    gm = _load("ref_gpen_model",
               f"{REF}/third_part/GPEN/face_model/gpen_model.py",
               extra_path=f"{REF}/third_part/GPEN/face_model")
    from s2v_tpu.models.gpen import FullGenerator

    sd = W.load_torch_checkpoint(f"{CKPTS}/GPEN-BFR-512.pth", key=None)
    ref = gm.FullGenerator(512, 512, 8, channel_multiplier=2, narrow=1,
                           device="cpu").eval()
    ref.load_state_dict({k: torch_in(v) for k, v in sd.items()})
    crop = (RNG.rand(1, 3, 512, 512).astype(np.float32) * 2 - 1)
    with torch.no_grad():
        want, _ = ref(torch_in(crop))
    got = FullGenerator(size=512).apply(
        jx(W.convert_gpen_full(sd, size=512)),
        jnp.asarray(crop.transpose(0, 2, 3, 1)), deterministic=True)
    results["stages"]["step5_gpen512_generator"] = _metrics(
        want.numpy(), np.asarray(got).transpose(0, 3, 1, 2))
    print("step5", results["stages"]["step5_gpen512_generator"], flush=True)

    # ---- Step 6 tail: GFPGANv1Clean ---------------------------------------
    import types

    base = f"{REF}/third_part/GFPGAN/gfpgan/archs"
    pkg = types.ModuleType("gfpgan_archs")
    pkg.__path__ = [base]
    sys.modules["gfpgan_archs"] = pkg
    sg = _load("gfpgan_archs.stylegan2_clean_arch",
               f"{base}/stylegan2_clean_arch.py")
    sys.modules["gfpgan_archs.stylegan2_clean_arch"] = sg
    gc = _load("gfpgan_archs.gfpganv1_clean_arch",
               f"{base}/gfpganv1_clean_arch.py")
    from s2v_tpu.models.gfpgan import GFPGANv1Clean

    sd = W.load_torch_checkpoint(f"{CKPTS}/GFPGANv1.4.pth", key="params_ema")
    ref = gc.GFPGANv1Clean(out_size=512, num_style_feat=512,
                           channel_multiplier=2, decoder_load_path=None,
                           fix_decoder=False, num_mlp=8, input_is_latent=True,
                           different_w=True, narrow=1, sft_half=True).eval()
    ref.load_state_dict({k: torch_in(v) for k, v in sd.items()})
    facex = (RNG.rand(1, 3, 512, 512).astype(np.float32) * 2 - 1)
    with torch.no_grad():
        want = ref(torch_in(facex), return_rgb=False)[0]
    got = GFPGANv1Clean().apply(
        jx(W.convert_gfpgan_clean(sd)),
        jnp.asarray(facex.transpose(0, 2, 3, 1)), deterministic=True)
    if isinstance(got, tuple):
        got = got[0]
    results["stages"]["step6_gfpgan_clean_512"] = _metrics(
        want.numpy(), np.asarray(got).transpose(0, 3, 1, 2))
    print("gfpgan", results["stages"]["step6_gfpgan_clean_512"], flush=True)

    # ---- final SR: RRDBNet x2 ---------------------------------------------
    rr = _load("ref_rrdbnet", f"{REF}/third_part/GPEN/sr_model/rrdbnet_arch.py",
               extra_path=f"{REF}/third_part/GPEN/sr_model")
    from s2v_tpu.models.rrdbnet import RRDBNet

    sd = W.load_torch_checkpoint(f"{CKPTS}/realesrnet_x2.pth", key="params_ema")
    ref = rr.RRDBNet(3, 3, num_feat=32, num_block=23, num_grow_ch=32,
                     scale=2).eval()
    ref.load_state_dict({k: torch_in(v) for k, v in sd.items()})
    img01 = RNG.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(torch_in(img01)).numpy()
    got = RRDBNet(scale=2, num_feat=32).apply(
        jx(W.convert_rrdbnet(sd)), jnp.asarray(img01.transpose(0, 2, 3, 1)))
    results["stages"]["final_rrdbnet_x2"] = _metrics(
        want, np.asarray(got).transpose(0, 3, 1, 2))
    print("rrdb", results["stages"]["final_rrdbnet_x2"], flush=True)

    # ---- pipeline output metrics (s2v_tpu full run, hooks ON, f32) ---------
    t0 = time.time()
    out_metrics = pipeline_output_metrics()
    out_metrics["wall_s"] = round(time.time() - t0, 1)
    results["pipeline_output"] = out_metrics
    print("pipeline", out_metrics, flush=True)

    tag = os.environ.get("S2V_ROUND", "r03")
    path = os.path.join(REPO, f"PARITY_{tag}.json")
    # merge: parity_pipeline.py writes its whole-pipeline section into the
    # same file
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
        merged.update(results)
        results = merged
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", path)


def pipeline_output_metrics():
    """Full s2v_tpu run on a synthetic clip (injected landmarks, hooks from
    the synthesized checkpoints, f32) -> PSNR vs input + LSE-C/LSE-D."""
    import wave

    import jax
    import jax.numpy as jnp

    from s2v_tpu import cli
    from s2v_tpu.io.video_io import VideoReader
    from s2v_tpu.pipeline.inference import LipSyncPipeline
    from s2v_tpu.pipeline.metrics import SyncNet, lse_metrics, psnr

    h, w, n = 120, 112, 4
    rs = np.random.RandomState(5)
    frames = (rs.rand(n, h, w, 3) * 255).astype(np.uint8)
    np.savez("/tmp/parity_clip.npz", frames=frames, fps=25.0)
    t = np.arange(int(n / 25.0 * 16000)) / 16000.0
    pcm = (np.sin(2 * np.pi * 220 * t) * 0.4 * 32767).astype(np.int16)
    with wave.open("/tmp/parity_speech.wav", "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(16000)
        wv.writeframes(pcm.tobytes())

    cfg = cli.parse_args([
        "--checkpoint_dir", CKPTS, "--tmp_dir", "/tmp/parity_tmp",
        "--lnet_batch_size", "4", "--re_preprocess",
        "--model.dtype", "float32",
    ])
    models = cli.load_models(CKPTS, cfg)
    models.final_enhancer = None  # 2048^2 GPEN on CPU: covered by verify
    pipe = LipSyncPipeline(cfg, models)

    from bench import _synthetic_landmarks

    def boxes(fr, batch=8):
        hh, ww = fr.shape[1], fr.shape[2]
        cx, cy, s = ww / 2, hh / 2, min(hh, ww) * 0.3
        return np.tile(np.asarray([cx - s, cy - s, cx + s, cy + s],
                                  np.float32), (len(fr), 1))

    def landmarks(fr, batch=8, return_boxes=False):
        lms = _synthetic_landmarks(len(fr), fr.shape[1], fr.shape[2])
        return (lms, boxes(fr)) if return_boxes else lms

    pipe.extract_landmarks = landmarks
    pipe.detect_boxes = boxes
    out_path = pipe.run("/tmp/parity_clip.npz", "/tmp/parity_speech.wav",
                        "/tmp/parity_out.npz")
    out = VideoReader(out_path).read_all()
    m = min(len(out), n)
    psnr_vs_input = float(psnr(jnp.asarray(out[:m].astype(np.float32)),
                               jnp.asarray(frames[:m].astype(np.float32))))

    # LSE via SyncNet embeddings (mouth crops + per-frame mel windows)
    from s2v_tpu.audio import mel_chunks_for_frames, melspectrogram
    from s2v_tpu.io.audio_io import load_wav

    wav = load_wav("/tmp/parity_speech.wav", 16000)
    mel = melspectrogram(jnp.asarray(wav))
    chunks = np.asarray(mel_chunks_for_frames(mel, m, 25.0))
    net = SyncNet()
    vars_ = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 96, 15)),
                     jnp.zeros((1, 80, 16, 1)))
    mouth = out[:m, out.shape[1] // 2 :, :, :].astype(np.float32)
    mouth = np.asarray(jax.image.resize(
        jnp.asarray(mouth), (m, 48, 96, 3), "bilinear")) / 255.0
    stacked = np.concatenate(
        [mouth[np.clip(np.arange(m) + k - 2, 0, m - 1)] for k in range(5)],
        axis=-1)
    fe, ae = jax.jit(net.apply)(
        vars_, jnp.asarray(stacked), jnp.asarray(chunks[:m][..., None]))
    lse_d, lse_c = lse_metrics(np.asarray(fe), np.asarray(ae))
    return {"psnr_out_vs_input_db": round(psnr_vs_input, 2),
            "lse_d": round(lse_d, 4), "lse_c": round(lse_c, 4),
            "frames": m,
            "note": "random-init weights; values prove the harness, "
                    "not quality"}


if __name__ == "__main__":
    main()
