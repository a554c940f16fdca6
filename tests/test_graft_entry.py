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
