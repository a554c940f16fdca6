"""Capture a jax.profiler trace of the generator stage program.

VERDICT r2 item 1 asked for an on-chip profile of the hot path. This tool
wraps the Step-6 generator program (the bench_generator workload from
bench.py) in ``jax.profiler.trace`` and reports what the runtime actually
produced — on the axon relay the device-side TraceMe stream may not make it
back to the host, so the summary distinguishes three outcomes:

  * ``xplane`` present with device planes -> full on-chip profile
  * ``xplane`` present, host planes only  -> dispatch-side profile only
  * trace call raised                      -> failure mode recorded verbatim

Usage: python tools/profile_capture.py [logdir]
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

    out: dict = {"logdir": logdir, "device": str(jax.devices()[0])}
    try:
        with jax.profiler.trace(logdir):
            gen = bench.bench_generator(batch=16)
        out["workload"] = {
            "metric": gen["metric"],
            "fps": gen["value"],
            "ms_per_batch": gen["detail"]["ms_per_batch"],
        }
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
