"""Training subsystems: arcface distributed trainer (DP x MP mesh), ENet
fine-tune step with style-conv freezing, checkpointing, cache, diagnostics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2v_tpu.parallel.mesh import make_mesh
from s2v_tpu.train.arcface import make_arcface_trainer
from s2v_tpu.train.finetune import style_conv_mask
from s2v_tpu.utils.cache import ArtifactCache
from s2v_tpu.utils.config import TrainConfig
from s2v_tpu.utils.diagnostics import AverageMeter, ThroughputLogger, global_norm

RNG = np.random.RandomState(151)


@pytest.mark.slow
def test_arcface_trainer_step_dp_mp():
    mesh = make_mesh(data_parallel=4, model_parallel=2)
    state, step_fn = make_arcface_trainer(
        mesh, num_classes=16, embedding_size=64, layers=(1, 1, 1, 1), lr=0.1
    )
    images = jnp.asarray(RNG.rand(8, 112, 112, 3).astype(np.float32))
    labels = jnp.asarray(RNG.randint(0, 16, size=8).astype(np.int32))
    # snapshot before stepping: the step donates its input state buffers
    before = jax.tree_util.tree_map(np.asarray, state.params)
    with mesh:
        s1, m1 = step_fn(state, images, labels)
        s2, m2 = step_fn(s1, images, labels)
    assert int(s2.step) == 2
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    # parameters actually moved
    diff = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), s2.params, before
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_style_conv_mask_selects_only_style_convs():
    params = {
        "style_conv0": {"bias": np.zeros(3)},
        "style_encoder": {"final_linear": {"weight": np.zeros((4, 4))}},
        "low_res": {"decoder": {"w": np.zeros(2)}},
    }
    mask = style_conv_mask(params)
    assert mask["style_conv0"]["bias"] is True
    assert mask["style_encoder"]["final_linear"]["weight"] is False
    assert mask["low_res"]["decoder"]["w"] is False


@pytest.fixture(scope="module")
def enet_variables():
    from s2v_tpu.models import ENet

    # slim LNet decoder (full depth covered by test_weight_parity)
    return ENet(lnet_res_blocks=2).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 80, 16, 1)),
        jnp.zeros((1, 384, 384, 6)), jnp.zeros((1, 384, 384, 3)),
    )


@pytest.mark.slow
def test_enet_finetune_updates_only_style_convs(enet_variables):
    from s2v_tpu.train.finetune_enet import make_enet_finetune_step

    variables = enet_variables
    state, step_fn = make_enet_finetune_step(variables, TrainConfig(lr=1e-3),
                                             lnet_res_blocks=2)
    batch = {
        "mel": jnp.asarray(RNG.rand(1, 80, 16, 1).astype(np.float32)),
        "face": jnp.asarray(RNG.rand(1, 384, 384, 6).astype(np.float32)),
        "ref": jnp.asarray(RNG.rand(1, 384, 384, 3).astype(np.float32)),
        "target": jnp.asarray(RNG.rand(1, 384, 384, 3).astype(np.float32)),
    }
    new_state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    def changed(a, b):
        return any(
            float(jnp.abs(x - y).max()) > 0
            for x, y in zip(jax.tree_util.tree_leaves(a),
                            jax.tree_util.tree_leaves(b))
        )

    assert changed(new_state.params["style_conv0"], state.params["style_conv0"])
    assert not changed(new_state.params["style_encoder"],
                       state.params["style_encoder"])
    assert not changed(new_state.params["low_res"], state.params["low_res"])


@pytest.mark.slow
def test_enet_finetune_real_vgg_and_identity_terms(enet_variables):
    """The wired fine-tune uses the converted VGG16 perceptual and the
    face3d identity embedding when supplied (training.py:94-134, 47-92)."""
    from s2v_tpu.models.resnet import ReconNet
    from s2v_tpu.models.vgg import VGG16Features
    from s2v_tpu.train.finetune_enet import (
        make_enet_finetune_step,
        make_id_embed_fn,
    )

    rng = jax.random.PRNGKey(1)
    _, k2, k3 = jax.random.split(rng, 3)
    variables = enet_variables
    vgg_vars = VGG16Features().init(k2, jnp.zeros((1, 224, 224, 3)))
    recon_vars = ReconNet().init(k3, jnp.zeros((1, 224, 224, 3)))
    state, step_fn = make_enet_finetune_step(
        variables, TrainConfig(lr=1e-3), lnet_res_blocks=2,
        id_embed_fn=make_id_embed_fn(recon_vars), vgg_variables=vgg_vars,
    )
    batch = {
        "mel": jnp.asarray(RNG.rand(1, 80, 16, 1).astype(np.float32)),
        "face": jnp.asarray(RNG.rand(1, 384, 384, 6).astype(np.float32)),
        "ref": jnp.asarray(RNG.rand(1, 384, 384, 3).astype(np.float32)),
        "target": jnp.asarray(RNG.rand(1, 384, 384, 3).astype(np.float32)),
    }
    _, metrics = step_fn(state, batch)
    assert {"l1", "perceptual", "id", "loss"} <= set(metrics)
    assert float(metrics["perceptual"]) > 0 and float(metrics["id"]) > 0
    assert np.isfinite(float(metrics["loss"]))


def test_checkpointer_roundtrip(tmp_path):
    from s2v_tpu.utils.checkpoint import TrainCheckpointer, load_variables, save_variables

    tree = {"a": jnp.arange(8, dtype=jnp.float32), "b": {"c": jnp.ones((2, 2))}}
    save_variables(str(tmp_path / "weights"), tree)
    restored = load_variables(str(tmp_path / "weights"), like=tree)
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.arange(8))

    ck = TrainCheckpointer(str(tmp_path / "train"), max_to_keep=2)
    for step in (1, 2, 3):
        ck.save(step, {"w": jnp.full((4,), float(step)), "step": jnp.asarray(step)})
    ck.wait()
    assert ck.latest_step() == 3
    got = ck.restore({"w": jnp.zeros((4,)), "step": jnp.asarray(0)})
    np.testing.assert_array_equal(np.asarray(got["w"]), np.full((4,), 3.0))
    ck.close()


def test_artifact_cache(tmp_path):
    cache = ArtifactCache(str(tmp_path))
    calls = []

    def compute():
        calls.append(1)
        return np.arange(5, dtype=np.float32)

    a = cache.get_or_compute("vid.mp4", "coeffs", compute)
    b = cache.get_or_compute("vid.mp4", "coeffs", compute)
    np.testing.assert_array_equal(a, b)
    assert len(calls) == 1  # second call hit the cache
    c = cache.get_or_compute("vid.mp4", "coeffs", compute, refresh=True)
    assert len(calls) == 2
    # parameter-dependent key
    cache.get_or_compute("vid.mp4", "coeffs", compute, params={"fps": 30})
    assert len(calls) == 3
    # dict payloads
    d = cache.get_or_compute(
        "vid.mp4", "multi", lambda: {"x": np.ones(3), "y": np.zeros(2)}
    )
    d2 = cache.get_or_compute("vid.mp4", "multi", lambda: None)
    np.testing.assert_array_equal(d["x"], d2["x"])


def test_artifact_cache_deferred_write(tmp_path):
    """defer=True returns fn's value unchanged (device arrays included),
    postpones the .npz write to flush(), and the flushed artifact serves
    later cache hits (pipeline/inference.py run() Step-3/5 writes)."""
    cache = ArtifactCache(str(tmp_path))
    dev_val = jnp.arange(6, dtype=jnp.float32)

    got = cache.get_or_compute("vid.mp4", "stab", lambda: dev_val,
                               defer=True)
    assert got is dev_val  # device array passes through on a miss
    assert not list(tmp_path.glob("*stab*.npz"))  # nothing written yet
    cache.flush()
    assert list(tmp_path.glob("*stab*.npz"))
    hit = cache.get_or_compute(
        "vid.mp4", "stab", lambda: (_ for _ in ()).throw(AssertionError))
    assert isinstance(hit, np.ndarray)
    np.testing.assert_array_equal(hit, np.arange(6, dtype=np.float32))
    # flush with nothing pending is a no-op
    cache.flush()


def test_diagnostics(tmp_path, capsys):
    m = AverageMeter()
    m.update(2.0)
    m.update(4.0)
    assert m.avg == 3.0
    assert float(global_norm({"a": jnp.asarray([3.0, 4.0])})) == 5.0
    log = ThroughputLogger(str(tmp_path / "log.jsonl"), every=2)
    log.step(1, 8, {"loss": 1.0})
    rec = log.step(2, 8, {"loss": 0.5})
    assert rec is not None and rec["step"] == 2
    assert (tmp_path / "log.jsonl").exists()
