"""HBM-feasibility + throughput probe for chunk>1 on the final
GPEN-BFR-2048 + RealESRNet x2 stage (verdict r3 item 4).

The product path pins ``chunk=1`` at 2048^2 (FaceEnhancer.__init__
defaults ``1 if in_size >= 1024``); round-3 never established whether a
larger chunk fits v5e HBM or helps throughput — the stage is
gather-descriptor-bound per the CPU roofline (tools/final2048_roofline.py),
so batching the crop/paste gathers is exactly what should amortize the
descriptor stream. This probe times the split 4-program chain
(reference inference.py:228-231,319-328 scope) AND the RealESRNet x2 SR
pass (which also dispatches via ``_chunked`` and so also scales with
chunk) at chunk in {1, 2, 4}, exact and ``approx_warp`` paths, on the
real chip.

Each configuration runs in its OWN SUBPROCESS so HBM held by a previous
configuration (live output buffers, compiled executables awaiting GC)
cannot contaminate the OOM/feasibility verdict of later chunk points; an
OOM/compile failure is that point's verdict, recorded verbatim.

Host<->device transfer costs are EXCLUDED by design: inputs are placed on
device before the timed loop, so ms/frame here is device-side program
time only (the e2e transfer floor is reported separately by
``bench.py devtime``'s link probe).

Run (relay up): python tools/final2048_chunk_probe.py
Output: one JSON line; merged into BENCH_LOCAL.json by hand.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(chunk: int, approx: bool) -> None:
    """Child mode: probe a single (chunk, approx) point and print one
    JSON line. Fresh process = fresh HBM (ADVICE r4: sequential configs
    in one process let stale buffers fake an OOM)."""
    import jax
    import jax.numpy as jnp
    from s2v_tpu.utils.jitcache import enable_persistent_cache

    enable_persistent_cache()

    from bench import _fill_variables
    from s2v_tpu.models.gpen import FullGenerator
    from s2v_tpu.models.parsenet import ParseNet
    from s2v_tpu.models.retinaface import RetinaFace
    from s2v_tpu.models.rrdbnet import RRDBNet
    from s2v_tpu.pipeline.enhance import FaceEnhancer

    z = np.zeros
    aux = {
        "retinaface": _fill_variables(
            RetinaFace().init, z((1, 768, 768, 3), np.float32)),
        "parsenet": _fill_variables(
            ParseNet().init, z((1, 512, 512, 3), np.float32)),
        "facegan": _fill_variables(
            FullGenerator(size=2048).init, z((1, 2048, 2048, 3), np.float32)),
        "srmodel": _fill_variables(
            RRDBNet(scale=2, num_feat=32).init, z((1, 384, 384, 3),
                                                  np.float32)),
    }
    rs = np.random.RandomState(11)
    n_iter = int(os.environ.get("S2V_PROBE_ITERS", "6"))
    res: dict = {}
    try:
        fin = FaceEnhancer(aux, in_size=2048, use_sr=True,
                           sr_scale=2, chunk=chunk, approx_warp=approx)
        x = jnp.asarray((rs.rand(chunk, 768, 768, 3) * 255)
                        .astype(np.uint8))
        mb = jnp.ones((1, 1, 1, 1), jnp.float32)
        # warm compile (all four split programs)
        out = fin._enhance_split(True, "sr", x, x, mb)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(n_iter):
            out = fin._enhance_split(True, "sr", out.astype(jnp.uint8), x, mb)
        jax.block_until_ready(out)
        enh_ms = (time.time() - t0) * 1000 / (n_iter * chunk)

        # The SR sub-stage (RealESRNet x2 on the 384^2 lip-sync output)
        # dispatches via _chunked too; time it at the same chunk so the
        # stage total reflects what process_batch actually runs.
        xs = jnp.asarray((rs.rand(chunk, 384, 384, 3) * 255)
                         .astype(np.uint8))
        sr = fin._sr(fin.models["srmodel"], xs)
        jax.block_until_ready(sr)
        t0 = time.time()
        for _ in range(n_iter):
            sr = fin._sr(fin.models["srmodel"], xs)
        jax.block_until_ready(sr)
        sr_ms = (time.time() - t0) * 1000 / (n_iter * chunk)

        res = {"ok": True,
               "enhance_ms_per_frame": round(enh_ms, 2),
               "sr_ms_per_frame": round(sr_ms, 2),
               "total_ms_per_frame": round(enh_ms + sr_ms, 2)}
    except Exception as e:  # OOM / remote-compile abort = verdict
        res = {"ok": False, "error": f"{type(e).__name__}: {e}"[:300]}
    print(json.dumps(res))


def main() -> None:
    if len(sys.argv) == 4 and sys.argv[1] == "--one":
        run_one(int(sys.argv[2]), bool(int(sys.argv[3])))
        return

    results = {}
    for approx in (False, True):
        for chunk in (1, 2, 4):
            key = f"chunk{chunk}_{'approx' if approx else 'exact'}"
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one",
                 str(chunk), str(int(approx))],
                capture_output=True, text=True, timeout=3600)
            line = (proc.stdout.strip().splitlines() or ["{}"])[-1]
            try:
                results[key] = json.loads(line)
            except json.JSONDecodeError:
                results[key] = {"ok": False,
                                "error": ("subprocess rc=%d stderr=%s"
                                          % (proc.returncode,
                                             proc.stderr[-300:]))}
            sys.stderr.write(f"{key}: {results[key]}\n")
    print(json.dumps({"metric": "final2048_chunk_probe", "value": None,
                      "unit": "ms/frame", "vs_baseline": None,
                      "detail": {"note": "device program time only; "
                                         "host<->device transfers excluded",
                                 **results}}))


if __name__ == "__main__":
    main()
