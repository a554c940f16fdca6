"""Capture a jax.profiler trace of the generator stage program.

VERDICT r2 item 1 asked for an on-chip profile of the hot path. This tool
wraps the Step-6 generator program (the bench_generator workload from
bench.py) in ``jax.profiler.trace`` and reports what the runtime actually
produced — on the axon relay the device-side TraceMe stream may not make it
back to the host, so the summary distinguishes three outcomes:

  * ``xplane`` present with device planes -> full on-chip profile
  * ``xplane`` present, host planes only  -> dispatch-side profile only
  * trace call raised                      -> failure mode recorded verbatim

Usage: python tools/profile_capture.py [logdir] [workload]
``workload`` is "generator" (default) or a comma-separated list of
bench.py devtime stage names (e.g. "mouth_tail,gpen512_step5") — each
stage's timed loop is traced into <logdir>/<stage>; mine the per-op
on-chip breakdown with ``python tools/xplane_summary.py <logdir>/<stage>``.
Prints one JSON line; the artifact dir is left for manual TensorBoard use.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time


def main() -> None:
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/s2v_profile"
    os.makedirs(logdir, exist_ok=True)

    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import bench  # noqa: E402  (repo-root bench.py)
    from s2v_tpu.utils.jitcache import enable_persistent_cache

    enable_persistent_cache()

    workload = sys.argv[2] if len(sys.argv) > 2 else "generator"
    out: dict = {"logdir": logdir, "workload_name": workload,
                 "device": str(jax.devices()[0])}
    try:
        if workload == "generator":
            with jax.profiler.trace(logdir):
                gen = bench.bench_generator(batch=16)
            out["workload"] = {
                "metric": gen["metric"],
                "fps": gen["value"],
                "ms_per_batch": gen["detail"]["ms_per_batch"],
            }
        else:
            stages = [s.strip() for s in workload.split(",") if s.strip()]
            res = bench.bench_devtime(
                with_final=any("final" in s for s in stages),
                stage_filter=set(stages), trace_logdir=logdir)
            out["workload"] = {"stages": res["detail"]["stages"]}
        out["trace_ok"] = True
    except Exception as e:  # noqa: BLE001 - the failure mode IS the result
        out["trace_ok"] = False
        out["error"] = f"{type(e).__name__}: {e}"

    # Inventory what the profiler wrote. A usable on-chip profile shows up
    # as *.xplane.pb with TPU device planes; host-only traces are far
    # smaller and carry only the python/runtime planes.
    files = sorted(glob.glob(os.path.join(logdir, "**", "*"), recursive=True))
    inv = [
        {"file": os.path.relpath(f, logdir), "bytes": os.path.getsize(f)}
        for f in files
        if os.path.isfile(f)
    ]
    out["artifacts"] = inv
    xplanes = [i for i in inv if i["file"].endswith(".xplane.pb")]
    if xplanes:
        # Cheap plane sniff without the tensorboard_plugin_profile dep:
        # device planes are named "/device:TPU:<n>" inside the proto.
        blob = b"".join(
            open(os.path.join(logdir, i["file"]), "rb").read()
            for i in xplanes
        )
        out["has_xplane"] = True
        out["device_planes"] = blob.count(b"/device:TPU")
        out["host_planes"] = blob.count(b"/host:")
    else:
        out["has_xplane"] = False

    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
