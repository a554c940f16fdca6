"""CPU roofline for the final GPEN-BFR-2048 + RealESRNet x2 stage.

The final enhancement stage (reference inference.py:228-231,319-328) is
the one program `bench.py devtime` could never cost-analyze on the TPU
relay (`flops_per_stage_batch16.final_gpen2048: null`): the fused 2048
program aborts the remote compile helper, and the split path is timed
host-side where `Compiled.cost_analysis()` is unavailable. FLOPs are a
property of the traced program, not the backend — so this tool lowers
the exact same four split-chain programs (detect+umeyama ->
faces_and_masks -> paste -> composite_sr) plus the RealESRNet x2
program on CPU with ABSTRACT arguments (jax.eval_shape for the model
variables, ShapeDtypeStruct for the data) and sums
`Lowered.cost_analysis()` FLOPs. Nothing is allocated or executed.

Run: JAX_PLATFORMS=cpu python tools/final2048_roofline.py
Output: one JSON object with per-program GFLOPs, the stage total, and
MFU at the round-3 measured 287.7 ms/frame (+ 36.7 SR) against the
v5e bf16 peak.
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp


# this image's sitecustomize pins JAX_PLATFORMS=axon at interpreter start;
# env vars are too late — override through jax.config before any backend
# initializes (same pattern as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s2v_tpu.utils.jitcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

V5E_BF16_PEAK_TFLOPS = 197.0
# round-3 devtime measurements (BENCH_LOCAL.json, v5e, product chunk 1)
MEASURED_MS = {"final_gpen2048": 287.7, "final_sr_x2": 36.7}


def _avals(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)


def main() -> None:
    from s2v_tpu.pipeline.enhance import FaceEnhancer

    # exactly the bench/product configuration: 2048 crop, SR x2 base,
    # RealESRNet num_feat 32 (real_esrnet.py:9-22), chunk 1, bf16 GANs
    enh = FaceEnhancer(models={}, in_size=2048, use_sr=True,
                       sr_scale=2, sr_num_feat=32, chunk=1)
    assert not enh._fuse_full  # 2048 runs the split 4-program chain

    from s2v_tpu.models.gpen import FullGenerator
    from s2v_tpu.models.parsenet import ParseNet
    from s2v_tpu.models.retinaface import RetinaFace
    from s2v_tpu.models.rrdbnet import RRDBNet

    k = jax.random.PRNGKey(0)
    # abstract variables: eval_shape traces init without allocating
    f384u = jax.ShapeDtypeStruct((1, 384, 384, 3), jnp.uint8)
    f768u = jax.ShapeDtypeStruct((1, 768, 768, 3), jnp.uint8)
    vr = jax.eval_shape(RetinaFace().init, k,
                        jax.ShapeDtypeStruct((1, 768, 768, 3), jnp.float32))
    vg = jax.eval_shape(FullGenerator(size=2048).init, k,
                        jax.ShapeDtypeStruct((1, 2048, 2048, 3),
                                             jnp.float32))
    vp = jax.eval_shape(ParseNet().init, k,
                        jax.ShapeDtypeStruct((1, 512, 512, 3), jnp.float32))
    vs = jax.eval_shape(RRDBNet(scale=2, num_feat=32).init, k,
                        jax.ShapeDtypeStruct((1, 384, 384, 3), jnp.float32))

    s = 2048
    crop3 = jax.ShapeDtypeStruct((1, s, s, 3), jnp.float32)
    mask1 = jax.ShapeDtypeStruct((1, s, s, 1), jnp.float32)
    m512 = jax.ShapeDtypeStruct((1, 512, 512, 1), jnp.float32)
    tfms = jax.ShapeDtypeStruct((1, 2, 3), jnp.float32)
    small = jax.ShapeDtypeStruct((1,), jnp.bool_)
    valid = jax.ShapeDtypeStruct((1,), jnp.bool_)
    img3 = jax.ShapeDtypeStruct((1, 768, 768, 3), jnp.float32)
    msk = jax.ShapeDtypeStruct((1, 768, 768, 1), jnp.float32)

    # exactly the bench devtime stage shapes: the split chain consumes
    # the x2-SR'd 768^2 frame (SR itself runs 384 -> 768); the GPEN crop
    # inside faces_and_masks is the full 2048^2 geometry
    programs = {
        "detect_tfms": (enh._detect_tfms, (vr, f768u)),
        "faces_and_masks": (
            lambda vg_, vp_, x, t, sm: enh._faces_and_masks(
                vg_, vp_, x, t, sm, True),
            (vg, vp, f768u, tfms, small)),
        "paste_fwd": (enh._paste_fwd, (crop3, mask1, m512, tfms, f768u)),
        "composite_sr": (enh._composite_sr, (f768u, img3, msk, valid)),
        "final_sr_x2": (enh._sr, (vs, f384u)),
    }

    flops = {}
    for name, (fn, args) in programs.items():
        lo = jax.jit(fn).lower(*args)
        ca = lo.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops[name] = float(ca["flops"])
        print(f"# {name}: {flops[name] / 1e9:.1f} GFLOP", file=sys.stderr)

    split_total = sum(v for k2, v in flops.items() if k2 != "final_sr_x2")
    out = {
        "gflop_per_frame": {k2: round(v / 1e9, 2)
                            for k2, v in flops.items()},
        "final_gpen2048_gflop": round(split_total / 1e9, 2),
        "mfu_at_measured_ms": {
            "final_gpen2048": round(
                (split_total / 1e12)
                / (MEASURED_MS["final_gpen2048"] / 1e3)
                / V5E_BF16_PEAK_TFLOPS, 4),
            "final_sr_x2": round(
                (flops["final_sr_x2"] / 1e12)
                / (MEASURED_MS["final_sr_x2"] / 1e3)
                / V5E_BF16_PEAK_TFLOPS, 4),
        },
        "speed_of_light_ms": {
            "final_gpen2048": round(
                split_total / 1e12 / V5E_BF16_PEAK_TFLOPS * 1e3, 2),
            "final_sr_x2": round(
                flops["final_sr_x2"] / 1e12 / V5E_BF16_PEAK_TFLOPS * 1e3,
                2),
        },
        "measured_ms_per_frame": MEASURED_MS,
        "note": "FLOPs from Lowered.cost_analysis() on CPU with abstract "
                "args; identical traced programs to the bench's split "
                "chain (enhance.py _enhance_split).",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
