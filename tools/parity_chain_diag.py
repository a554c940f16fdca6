"""Attribution for the 16-frame chain-parity decay (VERDICT r3 item 6).

PARITY_r03 showed per-frame PSNR decaying 47 dB (stabilized) -> 40 dB
(refs_384) -> 34 dB (final) with max_abs up to 139/255. Two hypotheses:

  (a) a geometry bug at one of the paste/blend seams (errors would
      concentrate on the seam rings / pasted-box borders), or
  (b) benign error amplification: sub-LSB host-resize/rounding
      differences at the chain head, amplified by random-init nets
      (errors would fill the pasted region and a torch-vs-torch control
      with 1-LSB input noise would show the same decay profile).

This tool runs both probes:

1. SPATIAL: re-runs the torch and jax sides (tools/parity_pipeline.py
   run_reference / run_s2v, same injected landmarks/boxes) and splits
   each seam's squared error into regions — inside the pasted face box
   (interior vs 4px border ring) and outside it. A seam bug shows up as
   ring-dominated error; amplification as interior-dominated.
2. CONTROL: runs the torch side a second time with the 256^2 cropped
   frames perturbed by +-1 gray level (the magnitude of the documented
   cv2-convention resize and uint8-rounding differences at the chain
   head) and computes torch-vs-torch metrics at the same three seams.
   If control PSNRs match the torch-vs-jax ones, the decay is input
   sensitivity of the random-init nets, not a seam defect.

    PYTHONPATH=/root/repo python tools/parity_chain_diag.py
    # ~25 min on the 1-CPU box; writes the 'chain_attribution' section
    # of PARITY_<S2V_ROUND>.json

Reference scope: inference.py:259-297 (Step 6 paste), :341-367 (datagen).
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import parity_pipeline as PP  # noqa: E402


def _seam_split(ref: np.ndarray, got: np.ndarray, boxes: np.ndarray,
                ring: int = 4):
    """Per-frame squared-error split: pasted-box interior / box border
    ring / outside the box. Returns mean fractions + region PSNRs."""
    agg = {"interior": [], "ring": [], "outside": [],
           "frac_interior": [], "frac_ring": [], "frac_outside": []}
    for a, b, (x1, y1, x2, y2) in zip(
            np.asarray(ref, np.float64), np.asarray(got, np.float64),
            np.asarray(boxes, np.int64)):
        d2 = ((a - b) ** 2).mean(-1)
        h, w = d2.shape
        box = np.zeros((h, w), bool)
        box[max(0, y1):min(h, y2), max(0, x1):min(w, x2)] = True
        inner = np.zeros((h, w), bool)
        inner[max(0, y1 + ring):min(h, y2 - ring),
              max(0, x1 + ring):min(w, x2 - ring)] = True
        ring_m = box & ~inner
        out_m = ~box
        tot = float(d2.sum()) or 1e-12

        def psnr(m):
            if not m.any():
                return 200.0
            mse = float(d2[m].mean())
            return 200.0 if mse == 0 else min(
                10.0 * np.log10(255.0 ** 2 / mse), 200.0)

        agg["interior"].append(psnr(inner))
        agg["ring"].append(psnr(ring_m))
        agg["outside"].append(psnr(out_m))
        agg["frac_interior"].append(float(d2[inner].sum()) / tot)
        agg["frac_ring"].append(float(d2[ring_m].sum()) / tot)
        agg["frac_outside"].append(float(d2[out_m].sum()) / tot)
    return {k: round(float(np.mean(v)), 3) for k, v in agg.items()}


def _metrics(ref, got):
    out = []
    for a, b in zip(np.asarray(ref, np.float64), np.asarray(got, np.float64)):
        mse = float(((a - b) ** 2).mean())
        out.append(200.0 if mse == 0 else min(
            10.0 * np.log10(255.0 ** 2 / mse), 200.0))
    return {"psnr_mean": round(float(np.mean(out)), 2),
            "psnr_worst": round(float(np.min(out)), 2)}


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import time
    import wave

    import jax.numpy as jnp

    from s2v_tpu.audio import mel_chunks_for_frames, melspectrogram
    from s2v_tpu.io.audio_io import load_wav

    N, H, W = PP.N, PP.H, PP.W
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
    got = PP.run_s2v(frames, mel)
    print(f"s2v side done in {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    want = PP.run_reference(frames, chunks)
    print(f"torch side done in {time.time() - t0:.0f}s", flush=True)

    # CONTROL: torch-vs-torch with +-1 gray of input noise. Perturbing the
    # full frames perturbs the 256^2 crops (the chain head) by <=1 LSB —
    # the magnitude of the documented resize-convention deltas.
    rs2 = np.random.RandomState(99)
    noise = rs2.randint(-1, 2, size=frames.shape).astype(np.int16)
    frames_n = np.clip(frames.astype(np.int16) + noise, 0, 255).astype(
        np.uint8)
    t0 = time.time()
    want_n = PP.run_reference(frames_n, chunks)
    print(f"torch control done in {time.time() - t0:.0f}s", flush=True)

    boxes = want["boxes"]  # smoothed padded (x1,y1,x2,y2) used for paste
    n_out = min(len(want["final"]), len(got["final"]))
    section = {
        "question": "is the 47->40->34 dB chain decay a seam bug or "
                    "benign amplification of sub-LSB head deltas?",
        "torch_vs_jax": {
            "stabilized": _metrics(want["stabilized"], got["stabilized"]),
            "refs_384": _metrics(want["refs_384"], got["refs_384"]),
            "final": _metrics(want["final"][:n_out], got["final"][:n_out]),
            "final_seam_split": _seam_split(
                want["final"][:n_out], got["final"][:n_out], boxes),
        },
        "torch_vs_torch_1lsb_control": {
            "stabilized": _metrics(want["stabilized"], want_n["stabilized"]),
            "refs_384": _metrics(want["refs_384"], want_n["refs_384"]),
            "final": _metrics(want["final"], want_n["final"]),
            "final_seam_split": _seam_split(
                want["final"], want_n["final"], boxes),
        },
    }
    print(json.dumps(section, indent=1), flush=True)
    tag = os.environ.get("S2V_ROUND", "r04")
    path = os.path.join(REPO, f"PARITY_{tag}.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data["chain_attribution"] = section
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
