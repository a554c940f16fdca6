"""Summarize a jax.profiler xplane.pb into a per-op device-time JSON.

The Chrome trace that jax.profiler writes caps at 1M events and is
host-dominated through the relay, so the on-chip story lives only in the
XSpace proto. This reads it with tensorflow's xplane_pb2 (baked into the
image), finds the TPU device plane, and aggregates the "XLA Ops" line
into per-op and per-HLO-category totals, with each op's achieved
TFLOP/s and GB/s computed from the profiler's own flops/bytes_accessed
stats — i.e. an automatic roofline classification (compute-bound vs
HBM-bound vs latency-bound) with JAX source attribution. This is the
MFU evidence the devtime bench's XLA-cost arithmetic could not confirm
(verdict r2/r3/r4 tracing item).

Usage: python tools/xplane_summary.py <logdir-or-xplane.pb> [top_n]
Prints one JSON line:
  {plane, busy_ms, span_ms, categories, top_ops: [{op, ms, count,
   tflops_per_s, gbytes_per_s, category, source, jax_op}]}.
"""

from __future__ import annotations

import collections
import glob
import json
import os
import re
import sys


def find_xplane(path: str) -> str:
    if os.path.isfile(path):
        return path
    cands = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                             recursive=True))
    if not cands:
        sys.exit(f"no *.xplane.pb under {path}")
    return cands[-1]


def _stat_value(stat):
    for f in ("str_value", "int64_value", "uint64_value", "double_value",
              "ref_value"):
        v = getattr(stat, f)
        if v:
            return v
    return 0


def main() -> None:
    src = find_xplane(sys.argv[1] if len(sys.argv) > 1 else "/tmp/s2v_profile")
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(src, "rb") as f:
        space.ParseFromString(f.read())

    dev = next((p for p in space.planes if "TPU" in p.name), None)
    if dev is None:
        print(json.dumps({"error": "no TPU plane",
                          "planes": [p.name for p in space.planes]}))
        return
    sm = {m.id: m.name for m in dev.stat_metadata.values()}
    meta = dev.event_metadata

    line = next((l for l in dev.lines
                 if (l.display_name or l.name) == "XLA Ops"), None)
    if line is None:
        print(json.dumps({"error": "no 'XLA Ops' line",
                          "lines": [l.display_name or l.name
                                    for l in dev.lines]}))
        return

    per_ps = collections.Counter()
    per_n = collections.Counter()
    span_lo, span_hi = None, 0
    for ev in line.events:
        per_ps[ev.metadata_id] += ev.duration_ps
        per_n[ev.metadata_id] += 1
        span_lo = ev.offset_ps if span_lo is None else min(span_lo,
                                                           ev.offset_ps)
        span_hi = max(span_hi, ev.offset_ps + ev.duration_ps)

    busy_ms = sum(per_ps.values()) / 1e9
    span_ms = (span_hi - (span_lo or 0)) / 1e9
    cats_ps = collections.Counter()
    cat_flops = collections.Counter()
    ops = []
    for mid, ps in per_ps.items():
        m = meta.get(mid)
        stats = {sm.get(s.metadata_id, str(s.metadata_id)): _stat_value(s)
                 for s in m.stats} if m else {}
        cat = str(stats.get("hlo_category", "unknown"))
        cats_ps[cat] += ps
        n = per_n[mid]
        flops = int(stats.get("flops", 0)) * n
        bytes_a = int(stats.get("bytes_accessed", 0)) * n
        cat_flops[cat] += flops
        secs = ps / 1e12
        name = (m.display_name or m.name) if m else str(mid)
        src_line = str(stats.get("source", ""))
        ops.append({
            "op": re.sub(r"\d{6,}", "#", name)[:100],
            "ms": round(ps / 1e9, 3),
            "count": n,
            "category": cat,
            "tflops_per_s": round(flops / secs / 1e12, 1) if flops else None,
            "gbytes_per_s": round(bytes_a / secs / 1e9, 1)
            if bytes_a else None,
            "source": src_line,
            "jax_op": str(stats.get("tf_op", ""))[:140],
        })
    ops.sort(key=lambda o: -o["ms"])
    out = {
        "file": src,
        "plane": dev.name,
        "busy_ms": round(busy_ms, 3),
        "span_ms": round(span_ms, 3),
        "busy_pct_of_span": round(100 * busy_ms / span_ms, 1)
        if span_ms else None,
        "n_events": sum(per_n.values()),
        "n_distinct_ops": len(per_ps),
        "categories_ms": {k: round(v / 1e9, 3)
                          for k, v in cats_ps.most_common()},
        "categories_avg_tflops_per_s": {
            k: round(cat_flops[k] / (v / 1e12) / 1e12, 1)
            for k, v in cats_ps.most_common() if cat_flops[k]},
        "top_ops": ops[:top_n],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
