"""Optimizer-state sharding (ZeRO / DeepSpeed-engine analogue) tests:
sharded moments train identically to replicated ones and round-trip
through orbax with their shardings (reference: emb/utils/engines.py:19,
emb/config.py:62-82)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from s2v_tpu.parallel.mesh import DATA_AXIS, make_mesh
from s2v_tpu.parallel.zero import shard_opt_state, zero_shardings


def _specs(tree):
    return [x.sharding.spec for x in jax.tree_util.tree_leaves(tree)
            if hasattr(x, "sharding")]


def test_zero_shardings_partition_large_leaves():
    mesh = make_mesh(8, 1)
    params = {
        "big": jnp.zeros((64, 128)),       # 64 % 8 == 0 -> sharded dim 0
        "tall": jnp.zeros((3, 40)),        # dim0 not divisible, dim1 is
        "bias": jnp.zeros((7,)),           # too small -> replicated
        "scalar": jnp.zeros(()),
    }
    opt_state = optax.adam(1e-3).init(params)
    sh = zero_shardings(mesh, opt_state, min_size=64)
    opt_state = jax.device_put(opt_state, sh)
    mu = opt_state[0].mu
    assert mu["big"].sharding.spec == P(DATA_AXIS)
    assert mu["tall"].sharding.spec == P(None, DATA_AXIS)
    assert mu["bias"].sharding.spec == P()
    # count leaf of adam stays replicated
    assert opt_state[0].count.sharding.spec == P()


def test_zero_like_pins_model_axis():
    mesh = make_mesh(4, 2)
    w = jax.device_put(jnp.zeros((16, 32)),
                       NamedSharding(mesh, P("model", None)))
    opt_state = optax.sgd(0.1, momentum=0.9).init(jnp.zeros((16, 32)))
    opt_state = shard_opt_state(mesh, opt_state, like=[w])
    trace = opt_state[0].trace
    assert trace.sharding.spec == P("model", None)


def test_sharded_opt_trains_like_replicated():
    """Two-step SGD+momentum with ZeRO-sharded trace == replicated trace."""
    mesh = make_mesh(8, 1)
    rs = np.random.RandomState(0)
    params = {"w": jnp.asarray(rs.randn(64, 16).astype(np.float32)),
              "b": jnp.asarray(rs.randn(16).astype(np.float32))}
    x = jnp.asarray(rs.randn(32, 64).astype(np.float32))
    y = jnp.asarray(rs.randn(32, 16).astype(np.float32))
    tx = optax.sgd(0.05, momentum=0.9)

    def loss_fn(p):
        return jnp.mean((x @ p["w"] + p["b"] - y) ** 2)

    def step(p, o):
        g = jax.grad(loss_fn)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o

    repl = NamedSharding(mesh, P())
    outs = {}
    for mode in ("repl", "zero"):
        p = jax.device_put(params, repl)
        o = tx.init(params)
        o = (shard_opt_state(mesh, o, min_size=64) if mode == "zero"
             else jax.device_put(o, repl))
        sh = jax.tree_util.tree_map(lambda t: t.sharding, (p, o))
        f = jax.jit(step, in_shardings=(sh[0], sh[1]),
                    out_shardings=(sh[0], sh[1]))
        with mesh:
            for _ in range(2):
                p, o = f(p, o)
        outs[mode] = np.asarray(p["w"])
        if mode == "zero":
            assert any(s != P() for s in _specs(o)), "trace not sharded"
    np.testing.assert_allclose(outs["zero"], outs["repl"], rtol=2e-5,
                               atol=2e-6)


def test_arcface_zero_opt_state_sharded_and_matches():
    """make_arcface_trainer(zero_opt=True): momentum leaves carry
    non-replicated shardings, the classifier momentum follows the class
    shard, and the loss matches the replicated-opt trainer exactly."""
    from s2v_tpu.train.arcface import make_arcface_trainer

    mesh = make_mesh(4, 2)
    kw = dict(num_classes=64, embedding_size=32, layers=(1, 1, 1, 1))
    rs = np.random.RandomState(1)
    images = jnp.asarray(rs.rand(8, 112, 112, 3).astype(np.float32))
    labels = jnp.asarray(rs.randint(0, 64, (8,)).astype(np.int32))

    state_z, step_z = make_arcface_trainer(
        mesh, rng=jax.random.PRNGKey(0), zero_opt=True, **kw)
    assert any(s != P() for s in _specs(state_z.opt_state))
    clf_specs = _specs(state_z.clf_opt_state)
    assert P("model", None) in clf_specs  # momentum follows the class shard

    state_r, step_r = make_arcface_trainer(
        mesh, rng=jax.random.PRNGKey(0), zero_opt=False, **kw)
    with mesh:
        sz, mz = step_z(state_z, images, labels)
        sr, mr = step_r(state_r, images, labels)
        # second step exercises momentum accumulation on the shards
        sz, mz2 = step_z(sz, images, labels)
        sr, mr2 = step_r(sr, images, labels)
    np.testing.assert_allclose(float(mz["loss"]), float(mr["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(mz2["loss"]), float(mr2["loss"]),
                               rtol=1e-5)


@pytest.mark.slow
def test_zero_opt_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore keeps the ZeRO shardings and the values."""
    from s2v_tpu.utils.checkpoint import TrainCheckpointer

    mesh = make_mesh(8, 1)
    rs = np.random.RandomState(2)
    params = {"w": jnp.asarray(rs.randn(64, 16).astype(np.float32))}
    tx = optax.adam(1e-3)
    opt = shard_opt_state(mesh, tx.init(params), min_size=64)
    # make moments nonzero so the value check is meaningful
    g = {"w": jnp.asarray(rs.randn(64, 16).astype(np.float32))}
    sh = jax.tree_util.tree_map(lambda t: t.sharding, opt)
    with mesh:
        _, opt = jax.jit(
            lambda o: tx.update(g, o, params),
            in_shardings=(sh,), out_shardings=(None, sh))(opt)

    ck = TrainCheckpointer(str(tmp_path / "ck"))
    ck.save(3, {"opt": opt})
    ck.wait()
    like = jax.tree_util.tree_map(
        lambda t: jax.ShapeDtypeStruct(t.shape, t.dtype, sharding=t.sharding),
        opt)
    restored = ck.restore({"opt": like})["opt"]
    ck.close()
    assert restored[0].mu["w"].sharding.spec == P(DATA_AXIS)
    np.testing.assert_allclose(np.asarray(restored[0].mu["w"]),
                               np.asarray(opt[0].mu["w"]), rtol=1e-6)
