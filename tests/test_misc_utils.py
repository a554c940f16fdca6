"""Host sharding, g2p, StableHLO export."""

import numpy as np

import jax
import jax.numpy as jnp

from s2v_tpu.parallel.hosts import is_leader, leader_only, shard_work
from s2v_tpu.prep.g2p import encode
from s2v_tpu.utils.export import check_parity, export_stablehlo, load_exported


def test_shard_work_partitions():
    items = list(range(10))
    shards = [shard_work(items, index=i, count=3) for i in range(3)]
    assert sorted(sum(shards, [])) == items
    assert all(len(s) >= 3 for s in shards)


def test_leader_only_runs_on_leader():
    calls = []

    @leader_only
    def record():
        calls.append(1)
        return "ok"

    out = record()
    assert is_leader()  # single-process test env
    assert out == "ok" and calls == [1]


def test_g2p_fallback():
    toks = encode("hello world")
    assert "_" in toks
    assert len(toks) > 4
    assert all(isinstance(t, str) for t in toks)
    # deterministic
    assert toks == encode("hello world")


def test_stablehlo_export_roundtrip():
    def fn(x, w):
        return jnp.tanh(x @ w)

    x = jnp.asarray(np.random.RandomState(0).randn(4, 8).astype(np.float32))
    w = jnp.asarray(np.random.RandomState(1).randn(8, 2).astype(np.float32))
    blob = export_stablehlo(fn, (x, w))
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 100
    restored = load_exported(blob)
    np.testing.assert_allclose(
        np.asarray(restored(x, w)), np.asarray(fn(x, w)), rtol=1e-6
    )
    ok, err = check_parity(fn, blob, (x, w))
    assert ok, err
