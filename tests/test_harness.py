"""Multi-engine trainer harness tests."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from s2v_tpu.train.harness import CommandChannel, Engine, Engines, train


def make_engine(seed=0):
    """Tiny linear-regression engine."""
    key = jax.random.PRNGKey(seed)
    w = jax.random.normal(key, (4, 1))
    tx = optax.sgd(0.1)
    state = {"w": w, "opt": tx.init(w)}

    @jax.jit
    def step(state, batch):
        def loss_fn(w):
            pred = batch["x"] @ w
            return jnp.mean((pred - batch["y"]) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(state["w"])
        upd, opt = tx.update(g, state["opt"])
        return {"w": optax.apply_updates(state["w"], upd), "opt": opt}, {"loss": loss}

    return Engine(state=state, step_fn=step, name=f"eng{seed}")


def make_batches(n):
    rng = np.random.RandomState(0)
    x = rng.randn(16, 4).astype(np.float32)
    y = x @ rng.randn(4, 1).astype(np.float32)
    batch = {"x": jnp.asarray(x), "y": jnp.asarray(y)}
    for _ in range(n):
        yield {"a": batch, "b": batch}


def test_engines_multi_model_step_and_checkpoint(tmp_path):
    engines = Engines(
        {"a": make_engine(0), "b": make_engine(1)},
        checkpoint_dir=str(tmp_path),
    )
    engines = train(engines, make_batches(20), save_every=10, max_steps=20)
    assert engines.global_step == 20

    # restore into fresh engines
    engines2 = Engines(
        {"a": make_engine(0), "b": make_engine(1)},
        checkpoint_dir=str(tmp_path),
    )
    step = engines2.load()
    assert step >= 20
    np.testing.assert_allclose(
        np.asarray(engines2["a"].state["w"]),
        np.asarray(engines["a"].state["w"]), rtol=1e-3, atol=1e-3,
    )


def test_command_channel_file_and_deferred(tmp_path):
    cmd_file = str(tmp_path / "cmd")
    ch = CommandChannel(cmd_file)
    with open(cmd_file, "w") as f:
        f.write("save")
    assert ch.poll(1) == "save"
    assert not (tmp_path / "cmd").exists()
    with open(cmd_file, "w") as f:
        f.write("eval@5")
    assert ch.poll(2) is None
    assert ch.poll(5) == "eval"


def test_train_quit_command(tmp_path):
    cmd_file = str(tmp_path / "cmd")
    engines = Engines({"a": make_engine(0), "b": make_engine(1)},
                      checkpoint_dir=str(tmp_path / "ck"))
    with open(cmd_file, "w") as f:
        f.write("quit")
    engines = train(engines, make_batches(100), command_file=cmd_file,
                    save_every=0, max_steps=None)
    assert engines.global_step == 1  # quit after the first step
