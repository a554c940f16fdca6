"""End-to-end pipeline integration test on a synthetic clip with
randomly-initialized models. Detection/landmarks are injected (random
detector weights can't find synthetic faces); everything downstream —
FFHQ crop, 3DMM alignment + ReconNet, coeff windows + DNet stabilization,
mel frontend, datagen-equivalent reference construction, ENet synthesis,
paste-back, video writing — runs for real.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2v_tpu.models import DNet, ENet
from s2v_tpu.models.resnet import ReconNet
from s2v_tpu.pipeline.inference import LipSyncPipeline, PipelineModels
from s2v_tpu.utils.config import PipelineConfig, override

RNG = np.random.RandomState(77)
N_FRAMES = 6
H, W = 160, 144


def synthetic_landmarks(n, h, w):
    """Plausible 68-point face landmarks centered in the frame."""
    lm = np.zeros((n, 68, 2), np.float32)
    cx, cy, s = w / 2, h / 2, min(h, w) * 0.25
    # chin arc 0-16
    t = np.linspace(-np.pi / 2, np.pi / 2, 17)
    lm[:, 0:17, 0] = cx + np.sin(t) * s
    lm[:, 0:17, 1] = cy + np.cos(t) * s * 1.1
    # brows 17-26
    lm[:, 17:22, 0] = cx - s * 0.6 + np.arange(5) * s * 0.2
    lm[:, 17:22, 1] = cy - s * 0.5
    lm[:, 22:27, 0] = cx + s * 0.1 + np.arange(5) * s * 0.15
    lm[:, 22:27, 1] = cy - s * 0.5
    # nose 27-35
    lm[:, 27:31, 0] = cx
    lm[:, 27:31, 1] = cy - s * 0.3 + np.arange(4) * s * 0.15
    lm[:, 31:36, 0] = cx - s * 0.2 + np.arange(5) * s * 0.1
    lm[:, 31:36, 1] = cy + s * 0.15
    # eyes 36-47
    lm[:, 36:42, 0] = cx - s * 0.45 + (np.arange(6) % 3) * s * 0.1
    lm[:, 36:42, 1] = cy - s * 0.25 + (np.arange(6) // 3) * s * 0.05
    lm[:, 42:48, 0] = cx + s * 0.25 + (np.arange(6) % 3) * s * 0.1
    lm[:, 42:48, 1] = cy - s * 0.25 + (np.arange(6) // 3) * s * 0.05
    # mouth 48-67
    t2 = np.linspace(0, 2 * np.pi, 12, endpoint=False)
    lm[:, 48:60, 0] = cx + np.cos(t2) * s * 0.35
    lm[:, 48:60, 1] = cy + s * 0.55 + np.sin(t2) * s * 0.15
    t3 = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    lm[:, 60:68, 0] = cx + np.cos(t3) * s * 0.2
    lm[:, 60:68, 1] = cy + s * 0.55 + np.sin(t3) * s * 0.08
    # slight per-frame jitter
    lm += RNG.randn(n, 1, 2).astype(np.float32) * 0.5
    return lm


@pytest.fixture(scope="module")
def pipeline():
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    # slim geometry throughout: the pipeline infers the arch from the
    # variable trees (LipSyncPipeline._recon_arch/_dnet_arch/_enet_arch);
    # full production geometry is covered by test_weight_parity. This
    # fixture tests the pipeline plumbing.
    recon_vars = ReconNet(layers=(1, 1, 1, 1), base_planes=8).init(
        k1, jnp.zeros((1, 224, 224, 3)))
    dnet_vars = DNet(descriptor_nc=16, warp_base_nc=8, edit_base_nc=8,
                     max_nc=32).init(
        k2, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1, 26, 73)))
    enet = ENet(lnet_res_blocks=2, channel_multiplier=0.25, narrow=0.25,
                lnet_base_nc=8, lnet_max_nc=32)
    enet_vars = enet.init(
        k3, jnp.zeros((1, 80, 16, 1)), jnp.zeros((1, 384, 384, 6)),
        jnp.zeros((1, 384, 384, 3)),
    )
    lm3d = np.asarray(
        [[-0.3, 0.2, 0.1], [0.3, 0.2, 0.1], [0.0, 0.0, 0.3],
         [-0.2, -0.3, 0.1], [0.2, -0.3, 0.1]], np.float64,
    )
    models = PipelineModels(
        recon=recon_vars, dnet=dnet_vars, enet=enet_vars,
        lm3d=lm3d, expression=np.zeros((64,), np.float32),
    )
    cfg = override(PipelineConfig(), {"infer.lnet_batch_size": 4})
    pipe = LipSyncPipeline(cfg, models)

    lm_by_shape = {}

    def fake_boxes(frames, batch=8):
        h, w = frames.shape[1:3]
        cx, cy, s = w / 2, h / 2, min(h, w) * 0.3
        box = np.asarray([cx - s, cy - s, cx + s, cy + s], np.float32)
        return np.tile(box, (len(frames), 1))

    def fake_landmarks(frames, batch=8, return_boxes=False):
        key = frames.shape[1:3]
        if key not in lm_by_shape:
            lm_by_shape[key] = synthetic_landmarks(0, *key)
        lms = synthetic_landmarks(len(frames), key[0], key[1])
        return (lms, fake_boxes(frames)) if return_boxes else lms

    pipe.extract_landmarks = fake_landmarks
    pipe.detect_boxes = fake_boxes
    return pipe


@pytest.mark.slow
def test_full_pipeline_runs(pipeline, tmp_path):
    frames = (RNG.rand(N_FRAMES, H, W, 3) * 255).astype(np.uint8)

    lm = pipeline.extract_landmarks(frames)
    frames_256, coords = pipeline.ffhq_crop(frames, lm[0])
    assert frames_256.shape == (N_FRAMES, 256, 256, 3)
    oy1, oy2, ox1, ox2 = coords
    assert 0 <= oy1 < oy2 <= H and 0 <= ox1 < ox2 <= W

    lm_256 = pipeline.extract_landmarks(frames_256)
    semantic = pipeline.extract_coeffs(frames_256, lm_256, batch=4)
    assert semantic.shape == (N_FRAMES, 262)
    assert np.isfinite(semantic).all()

    stabilized = pipeline.stabilize(frames_256, semantic, batch=4)
    assert stabilized.shape == (N_FRAMES, 256, 256, 3)
    assert stabilized.dtype == np.uint8

    # 1 second of synthetic speech at 16 kHz -> 25 fps clip, 6 frames used
    t = np.arange(16000) / 16000.0
    wav = (0.5 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    from s2v_tpu.audio import melspectrogram

    mel = melspectrogram(jnp.asarray(wav))

    out = pipeline.synthesize(stabilized, mel, frames, coords, fps=25.0)
    # mirrored frame indexing covers all mel chunks
    from s2v_tpu.audio.melspec import num_mel_chunks

    assert len(out) == num_mel_chunks(mel.shape[1], 25.0)
    assert out.shape[1:] == (H, W, 3)
    assert out.dtype == np.uint8

    # write + "mux" (codec-free path)
    from s2v_tpu.io.video_io import VideoWriter, mux_audio

    vw = VideoWriter(str(tmp_path / "result.npz"), 25.0, (H, W))
    for f in out:
        vw.write(f)
    vw.close()
    assert os.path.getsize(vw.path) > 0


def _write_wav(path, seconds=0.35, sr=16000):
    import wave

    t = np.arange(int(seconds * sr)) / sr
    pcm = (np.sin(2 * np.pi * 220 * t) * 0.4 * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def test_run_with_hooks_and_cache(pipeline, tmp_path):
    """Full run(): batched restoration hooks, 2x final-enhanced output,
    --cropped_image 1x output, and the per-video artifact cache
    (reference: inference.py:228-330, facing.py:89-198).

    This test checks ORCHESTRATION (hook call contracts, cache keys, output
    geometry), so the heavy device programs are replaced with shape-correct
    fakes — the real models run in test_full_pipeline_runs above; the real
    hooks run in tests/test_restoration_tail.py."""
    import dataclasses

    from s2v_tpu.io.video_io import VideoReader
    from s2v_tpu.utils.config import override as cfg_override

    pipe = pipeline
    old_cfg, old_models = pipe.cfg, pipe.models
    old_jits = dict(pipe._jits)
    # shape-correct fakes for the heavy programs (orchestration test)
    pipe._jits = {
        "recon": lambda v, x: jnp.ones((x.shape[0], 257), jnp.float32) * 0.1,
        "dnet": lambda v, img, c: jnp.clip(img, -1.0, 1.0),
        "enet": lambda v, mel, face, ref: jnp.clip(face[..., :3] + 0.1, 0, 1),
    }

    frames = (RNG.rand(N_FRAMES, H, W, 3) * 255).astype(np.uint8)
    clip = tmp_path / "clip.npz"
    np.savez_compressed(clip, frames=frames, fps=25.0)
    wav = tmp_path / "speech.wav"
    _write_wav(wav)

    calls = {"stab": 0, "ref": 0, "mouth": 0, "final": 0}
    real_stabilize = pipe.stabilize

    def counting_stabilize(*a, **k):
        calls["stab"] += 1
        return real_stabilize(*a, **k)

    def ref_hook(stack):
        calls["ref"] += 1
        assert stack.ndim == 4 and stack.shape[1:] == (256, 256, 3)
        return stack

    def mouth_hook(fr, boxes):
        calls["mouth"] += 1
        assert fr.ndim == 4 and boxes.shape == (len(fr), 4)
        return fr

    def final_hook(fr, boxes):
        calls["final"] += 1
        return np.repeat(np.repeat(fr, 2, axis=1), 2, axis=2).astype(np.uint8)

    try:
        pipe.stabilize = counting_stabilize
        pipe.models = dataclasses.replace(
            old_models, ref_enhancer=ref_hook, mouth_restorer=mouth_hook,
            final_enhancer=final_hook,
        )
        pipe.cfg = cfg_override(old_cfg, {"infer.tmp_dir": str(tmp_path / "t")})

        out_path = pipe.run(str(clip), str(wav), str(tmp_path / "out.npz"))
        got = VideoReader(out_path).read_all()
        assert got.shape[1:] == (2 * H, 2 * W, 3)  # 2x (inference.py:246)
        assert calls == {"stab": 1, "ref": 1,
                         "mouth": calls["mouth"], "final": calls["final"]}
        assert calls["mouth"] >= 1 and calls["final"] >= 1

        # second run hits the artifact cache: Steps 1-3/5 skipped
        pipe.run(str(clip), str(wav), str(tmp_path / "out2.npz"))
        assert calls["stab"] == 1 and calls["ref"] == 1

        # --re_preprocess forces recompute
        pipe.cfg = cfg_override(pipe.cfg, {"infer.re_preprocess": "true"})
        pipe.run(str(clip), str(wav), str(tmp_path / "out3.npz"))
        assert calls["stab"] == 2 and calls["ref"] == 2

        # --cropped_image: 1x output (inference.py:316-325)
        pipe.cfg = cfg_override(
            pipe.cfg, {"infer.cropped_image": "true",
                       "infer.re_preprocess": "false"})
        out4 = pipe.run(str(clip), str(wav), str(tmp_path / "out4.npz"))
        got4 = VideoReader(out4).read_all()
        assert got4.shape[1:] == (H, W, 3)
    finally:
        pipe.cfg, pipe.models, pipe.stabilize = old_cfg, old_models, real_stabilize
        pipe._jits = old_jits


def test_landmark_program_bf16_smoke():
    """The real fused S3FD+FAN program runs in both detector dtypes.

    Random weights make bf16-vs-f32 landmark deltas meaningless (heatmap
    argmax sits on near-ties), so this asserts the bf16 program's contract
    only: shapes, finiteness, and f32 outputs from the decode. Numeric
    tolerance vs f32 needs real checkpoints (documented in COMPONENTS.md).
    """
    rng = jax.random.PRNGKey(5)
    from s2v_tpu.models.fan import FAN
    from s2v_tpu.models.s3fd import S3FD

    frames = jnp.asarray((RNG.rand(2, 128, 128, 3) * 255).astype(np.uint8))
    s3fd_vars = S3FD().init(rng, jnp.zeros((1, 128, 128, 3)))
    fan_vars = FAN(num_modules=1).init(rng, jnp.zeros((1, 256, 256, 3)))

    outs = {}
    for det_dt in ("float32", "bfloat16"):
        cfg = override(PipelineConfig(), {"model.detector_dtype": det_dt})
        pipe = LipSyncPipeline(cfg, PipelineModels())
        # num_modules=1 keeps the CPU compile small; the program structure
        # (detect -> separable crop -> FAN -> decode) is identical
        import s2v_tpu.pipeline.inference as inf_mod

        orig = inf_mod.FAN
        inf_mod.FAN = lambda: FAN(num_modules=1)
        try:
            run = pipe._landmark_fn()
            boxes, valid, lms = run(s3fd_vars, fan_vars, frames)
        finally:
            inf_mod.FAN = orig
        assert boxes.shape == (2, 4) and lms.shape == (2, 68, 2)
        assert lms.dtype == jnp.float32
        assert np.isfinite(np.asarray(lms)).all()
        outs[det_dt] = np.asarray(lms)
