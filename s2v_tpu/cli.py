"""Command-line entry (reference CLI: python3 inference.py --face --audio
--outfile, flags from futils/inference_utils.py:16-51).

    python -m s2v_tpu.cli infer --face clip.mp4 --audio speech.wav \
        --outfile results/out.mp4 --checkpoint_dir checkpoints

Checkpoints are the reference's torch files (DNet.pt, LNet.pth, ENet.pth,
face3d_pretrain_epoch_20.pth, s3fd.pth, FAN 2DFAN-4 and the BFM folder),
converted on load by s2v_tpu.utils.weights.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def load_models(checkpoint_dir: str, cfg=None, mesh=None):
    """Build PipelineModels from a checkpoint dir. ``mesh`` (a
    jax.sharding.Mesh) threads into the enhancement/restoration hooks so
    their chunks run frame-sharded over the mesh's data axis — pass the
    same mesh to LipSyncPipeline (see main())."""
    import jax

    from s2v_tpu.pipeline.inference import PipelineModels
    from s2v_tpu.utils import weights as W

    infer_cfg = cfg.infer if cfg is not None else None

    def maybe(path):
        full = os.path.join(checkpoint_dir, path)
        return full if os.path.isfile(full) else None

    def as_vars(tree):
        return jax.tree_util.tree_map(np.asarray, tree)

    models = PipelineModels()
    if maybe("s3fd.pth"):
        models.s3fd = as_vars(
            W.convert_s3fd(W.load_torch_checkpoint(maybe("s3fd.pth"), key=None))
        )
    fan_path = maybe("2DFAN4-cd938726ad.zip") or maybe("2DFAN4.pth")
    if fan_path:
        models.fan = as_vars(
            W.convert_fan(W.load_torch_checkpoint(fan_path, key=None))
        )
    if maybe("face3d_pretrain_epoch_20.pth"):
        models.recon = as_vars(
            W.convert_recon_net(
                W.load_torch_checkpoint(
                    maybe("face3d_pretrain_epoch_20.pth"), key="net_recon"
                )
            )
        )
    if maybe("DNet.pt"):
        models.dnet = as_vars(
            W.convert_dnet(W.load_torch_checkpoint(maybe("DNet.pt"), key="net_G_ema"))
        )
    if maybe("ENet.pth") and maybe("LNet.pth"):
        enet_sd = W.load_torch_checkpoint(maybe("ENet.pth"))
        lnet_sd = W.load_torch_checkpoint(maybe("LNet.pth"))
        models.enet = as_vars(W.convert_enet(enet_sd, lnet_sd))
    bfm = os.path.join(checkpoint_dir, "BFM")
    if os.path.isdir(bfm):
        from s2v_tpu.pipeline.face3d_prep import load_lm3d

        models.lm3d = load_lm3d(bfm)
    expr_mat = maybe("expression.mat")
    if expr_mat:
        from scipy.io import loadmat

        mat = loadmat(expr_mat)
        models.expression = np.asarray(mat["expression_center"][0], np.float32)

    # --- restoration stack (GPEN / GFPGAN / ParseNet / RetinaFace) ---
    aux = {}
    retina_path = maybe("RetinaFace-R50.pth") or maybe(
        os.path.join("weights", "RetinaFace-R50.pth")
    )
    if retina_path:
        aux["retinaface"] = as_vars(
            W.convert_retinaface(W.load_torch_checkpoint(retina_path, key=None))
        )
    parse_path = maybe("ParseNet-latest.pth") or maybe(
        os.path.join("weights", "ParseNet-latest.pth")
    )
    if parse_path:
        aux["parsenet"] = as_vars(
            W.convert_parsenet(W.load_torch_checkpoint(parse_path, key=None))
        )
    gfp_path = maybe("GFPGANv1.4.pth") or maybe("GFPGANv1.3.pth")
    if gfp_path:
        sd = W.load_torch_checkpoint(gfp_path, key="params_ema")
        aux["gfpgan"] = as_vars(W.convert_gfpgan_clean(sd))
    elif maybe("GFPGANv1.pth"):
        sd = W.load_torch_checkpoint(maybe("GFPGANv1.pth"), key="params_ema")
        aux["gfpgan"] = as_vars(W.convert_gfpgan_v1(sd))
        aux["gfpgan_arch"] = "original"
    gpen512 = maybe("GPEN-BFR-512.pth") or maybe(
        os.path.join("weights", "GPEN-BFR-512.pth")
    )
    if gpen512 and "retinaface" in aux and "parsenet" in aux:
        from s2v_tpu.pipeline.enhance import FaceEnhancer

        gan512 = as_vars(
            W.convert_gpen_full(W.load_torch_checkpoint(gpen512, key=None), size=512)
        )
        dt = cfg.model.dtype if cfg is not None else "bfloat16"
        aw = cfg.model.approx_warp if cfg is not None else False
        ddt = cfg.model.detector_dtype if cfg is not None else "float32"
        ps = cfg.model.parse_size if cfg is not None else 512
        enhancer = FaceEnhancer(
            {"retinaface": aux["retinaface"], "parsenet": aux["parsenet"],
             "facegan": gan512},
            in_size=512, dtype=dt, approx_warp=aw, det_dtype=ddt,
            parse_size=ps, mesh=mesh,
        )
        # Step-5 reference enhancement, batched over the whole clip
        # (inference.py:225-227,234-238: in_size 512, face_enhance=False).
        # landmarks5/det_boxes thread through for the detector-reuse path
        # (config model.reuse_detections).
        models.ref_enhancer = lambda frames, **kw: enhancer.process_batch(
            frames, face_enhance=False,
            device_out=not isinstance(frames, np.ndarray), **kw)

    # final full-frame enhancement: GPEN-BFR-2048 + RealESRNet x2, output at
    # 2x the input resolution (inference.py:228-231,246,317-330)
    gpen2048 = maybe("GPEN-BFR-2048.pth") or maybe(
        os.path.join("weights", "GPEN-BFR-2048.pth")
    )
    rrdb_path = maybe("realesrnet_x2.pth") or maybe(
        os.path.join("weights", "realesrnet_x2.pth")
    )
    if gpen2048 and "retinaface" in aux and "parsenet" in aux:
        from s2v_tpu.pipeline.enhance import FaceEnhancer

        final_models = {
            "retinaface": aux["retinaface"], "parsenet": aux["parsenet"],
            "facegan": as_vars(W.convert_gpen_full(
                W.load_torch_checkpoint(gpen2048, key=None), size=2048)),
        }
        if rrdb_path:
            final_models["srmodel"] = as_vars(W.convert_rrdbnet(
                W.load_torch_checkpoint(rrdb_path, key="params_ema")))
        final = FaceEnhancer(
            final_models, in_size=2048, use_sr=True, sr_scale=2,
            dtype=cfg.model.dtype if cfg is not None else "bfloat16",
            approx_warp=cfg.model.approx_warp if cfg is not None else False,
            det_dtype=(cfg.model.detector_dtype
                       if cfg is not None else "float32"),
            parse_size=cfg.model.parse_size if cfg is not None else 512,
            mesh=mesh)

        def final_hook(frames, boxes_xyxy, **kw):
            # bbox only matters on the non-SR possion fallback
            # (face_enhancement.py:179-189); layout there is (y1,y2,x1,x2)
            bb = np.asarray(boxes_xyxy)[:, [1, 3, 0, 2]]
            return final.process_batch(
                frames, face_enhance=True, possion_blending=True, bboxes=bb,
                **kw)

        models.final_enhancer = final_hook
    from s2v_tpu.pipeline.restoration import make_mouth_restorer

    models.mouth_restorer = make_mouth_restorer(
        aux,
        approx_warp=cfg.model.approx_warp if cfg is not None else False,
        det_dtype=(cfg.model.detector_dtype
                   if cfg is not None else "float32"),
        parse_size=cfg.model.parse_size if cfg is not None else 512,
        parse_dtype=(cfg.model.detector_dtype
                     if cfg is not None else "float32"),
        mesh=mesh)
    gani_path = maybe("30_net_gen.pth") or maybe("ganimation.pth")
    if gani_path:
        models.ganimation = as_vars(
            W.convert_ganimation(W.load_torch_checkpoint(gani_path, key=None))
        )
        if infer_cfg is not None and infer_cfg.up_face != "original":
            # --up_face (inference.py:250-253,267-281): GANimation edit of
            # the upper face, composited through the --without_rl1 mask
            from s2v_tpu.pipeline.restoration import make_up_face_editor

            models.up_face_editor = make_up_face_editor(
                {"ganimation": models.ganimation}, infer_cfg.up_face)
    return models


def parse_args(argv):
    """argv (without the command) -> PipelineConfig. Reference-style flat
    flags (futils/inference_utils.py options()) map onto infer.*; dotted
    keys address the config tree directly; --config overlays a file first.
    """
    flat_flags = {
        "config",
        "face", "audio", "outfile", "exp_img", "up_face", "fps", "pads",
        "static", "one_shot", "tmp_dir", "re_preprocess", "checkpoint_dir",
        "cropped_image", "nosmooth", "without_rl1", "box", "crop",
        "face_det_batch_size", "lnet_batch_size", "LNet_batch_size",
    }
    overrides = {}
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--"):
            key = a[2:]
            if "=" in key:
                key, val = key.split("=", 1)
                i += 1
            elif i + 1 < len(argv) and not argv[i + 1].startswith("--"):
                if key in ("box", "crop", "pads"):
                    # nargs='+'-style tuples (inference.py --box/--crop/--pads)
                    vals = []
                    i += 1
                    while i < len(argv) and not argv[i].startswith("--"):
                        vals.append(argv[i])
                        i += 1
                    val = ",".join(vals)
                else:
                    val = argv[i + 1]
                    i += 2
            else:
                val = "true"
                i += 1
            if "." in key:
                overrides[key] = val
            elif key == "config":
                overrides["config"] = val
            elif key in flat_flags:
                if key == "LNet_batch_size":
                    key = "lnet_batch_size"
                overrides[f"infer.{key}"] = val
            else:
                raise SystemExit(f"unknown flag --{key}")
        else:
            i += 1
    from s2v_tpu.utils.config import PipelineConfig, load_config_file, override

    cfg = PipelineConfig()
    if "config" in overrides:  # --config file.yml|json|py applied first,
        cfg = load_config_file(overrides.pop("config"), base=cfg)
    return override(cfg, overrides)  # explicit flags win


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    command = argv.pop(0) if argv and not argv[0].startswith("--") else "infer"
    cfg = parse_args(argv)

    # persistent XLA compilation cache: a second run of the same pipeline
    # skips all XLA compiles (the programs, not just the per-video data the
    # artifact cache covers)
    from s2v_tpu.utils.jitcache import enable_persistent_cache

    enable_persistent_cache()

    if command == "infer":
        from s2v_tpu.pipeline.inference import LipSyncPipeline

        mesh = None
        if cfg.parallel.infer_mesh:
            # frame-axis sharding of every stage over the device mesh
            # (--parallel.infer_mesh true [--parallel.data_parallel N])
            from s2v_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(cfg.parallel.data_parallel,
                             cfg.parallel.model_parallel)
        models = load_models(cfg.infer.checkpoint_dir, cfg, mesh=mesh)
        pipe = LipSyncPipeline(cfg, models, mesh=mesh)
        out = pipe.run(cfg.infer.face, cfg.infer.audio, cfg.infer.outfile)
        print("outfile:", out)
    elif command == "train":
        # training.py equivalent: fine-tune ENet style convs on one video
        import jax.numpy as jnp

        from s2v_tpu.audio import melspectrogram
        from s2v_tpu.io.audio_io import load_wav
        from s2v_tpu.io.video_io import VideoReader
        from s2v_tpu.pipeline.inference import LipSyncPipeline
        from s2v_tpu.train.data import build_enet_batches
        from s2v_tpu.train.finetune_enet import finetune

        models = load_models(cfg.infer.checkpoint_dir, cfg)
        pipe = LipSyncPipeline(cfg, models)
        reader = VideoReader(cfg.infer.face)
        frames = reader.read_all()
        fps = reader.fps or cfg.infer.fps
        lm = pipe.extract_landmarks(frames)
        frames_256, coords = pipe.ffhq_crop(frames, lm[0])
        semantic = pipe.extract_coeffs(frames_256,
                                       pipe.extract_landmarks(frames_256))
        stabilized = pipe.stabilize(frames_256, semantic)
        wav = load_wav(cfg.infer.audio, cfg.audio.sample_rate)
        mel = melspectrogram(jnp.asarray(wav), cfg.audio)
        batches = build_enet_batches(
            pipe, stabilized, mel, frames, coords, fps,
            batch_size=cfg.train.batch_size,
        )
        # real VGG16 perceptual when the torchvision checkpoint is present
        # (training.py:94-134); identity term from the face3d regressor
        # (training.py:47-92 capability)
        from s2v_tpu.models.vgg import convert_vgg16_features
        from s2v_tpu.train.finetune_enet import make_id_embed_fn
        from s2v_tpu.utils import weights as W

        vgg_vars = None
        for name in ("vgg16-397923af.pth", "vgg16.pth"):
            p = os.path.join(cfg.infer.checkpoint_dir, name)
            if os.path.isfile(p):
                vgg_vars = convert_vgg16_features(
                    W.load_torch_checkpoint(p, key=None))
                break
        id_embed = (make_id_embed_fn(models.recon)
                    if models.recon is not None else None)
        state = finetune(
            models.enet, batches, cfg.train,
            checkpoint_dir=f"{cfg.infer.tmp_dir}/enet_ckpt",
            log_path=f"{cfg.infer.tmp_dir}/train_log.jsonl",
            id_embed_fn=id_embed, vgg_variables=vgg_vars,
        )
        print(f"trained {int(state.step)} steps")
    elif command == "find-audio":
        # inference.py:414-468 find_best_audio: pick the database wav (same
        # directory as --audio) with the smallest fastdtw distance, cached
        # per clip basename under tmp_dir unless --re_preprocess
        import glob

        import numpy as np

        from s2v_tpu.audio.dtw import find_best_audio
        from s2v_tpu.io.audio_io import load_wav

        base = os.path.basename(cfg.infer.face)
        cache_path = os.path.join(cfg.infer.tmp_dir, f"{base}_best_audio.npy")
        if os.path.isfile(cache_path) and not cfg.infer.re_preprocess:
            best = str(np.load(cache_path))
        else:
            src = load_wav(cfg.infer.audio, cfg.audio.sample_rate)
            database = {
                f: load_wav(f, cfg.audio.sample_rate)
                for f in sorted(
                    glob.glob(os.path.join(os.path.dirname(cfg.infer.audio),
                                           "*.wav")))
                if os.path.abspath(f) != os.path.abspath(cfg.infer.audio)
            }
            if not database:
                raise SystemExit("no other .wav files next to --audio")
            best, dist = find_best_audio(np.asarray(src), database)
            os.makedirs(cfg.infer.tmp_dir, exist_ok=True)
            np.save(cache_path, best)
            print(f"distance: {dist:.1f}")
        print("best_audio:", best)
    elif command == "bench":
        import bench

        bench.main()
    else:
        raise SystemExit(
            f"unknown command {command!r}; use infer|train|find-audio|bench")


if __name__ == "__main__":
    main()
