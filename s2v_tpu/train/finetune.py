"""Sharded fine-tuning step (reference: training.py:189-471, done correctly).

The reference fine-tunes on one video, single-GPU, Adam(lr=0.01), freezing
everything but ENet's style convs (ENet.set_training_style, ENet.py:141-153).
Here the train step is a single jitted SPMD program over the (data, model)
mesh:

- batch (frames) sharded on the ``data`` axis — the DDP equivalent;
- an optional class-sharded identity classifier on the ``model`` axis — the
  PartialFC equivalent (s2v_tpu.parallel.partial_fc);
- optimizer state sharded like the params (trivially replicated here; the
  ZeRO analogue for larger models is a sharding rule swap, not new code).

Trainable-parameter masking reproduces set_training_style via an optax mask.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from s2v_tpu.parallel.mesh import DATA_AXIS
from s2v_tpu.train.losses import l1_loss, perceptual_stub


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def style_conv_mask(params) -> Any:
    """True only for ENet style-conv / to-rgb params (ENet.py:141-153 keeps
    style_convs trainable; everything else frozen)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def trainable(path):
        keys = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        return "style_conv" in keys

    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params),
        [trainable(path) for path, _ in flat],
    )


def make_optimizer(lr: float, params, mask_fn: Optional[Callable] = None):
    if mask_fn is None:
        return optax.adam(lr)
    labels = jax.tree_util.tree_map(
        lambda trainable: "train" if trainable else "freeze", mask_fn(params)
    )
    return optax.multi_transform(
        {"train": optax.adam(lr), "freeze": optax.set_to_zero()}, labels
    )


def make_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    l1_weight: float = 1.0,
    perceptual_weight: float = 0.01,
):
    """Build a jitted (state, batch) -> (state, metrics) step.

    apply_fn(params, batch) must return the predicted frames; batch is a dict
    with at least 'target'. When a mesh is given, batch arrays are expected
    frame-sharded on the data axis and params replicated — XLA inserts the
    gradient all-reduce (DDP) automatically.
    """

    def loss_fn(params, batch):
        pred = apply_fn(params, batch)
        loss_l1 = l1_loss(pred, batch["target"])
        loss_p = perceptual_stub(pred, batch["target"])
        loss = l1_weight * loss_l1 + perceptual_weight * loss_p
        return loss, {"loss": loss, "l1": loss_l1, "perceptual": loss_p}

    def step(state: TrainState, batch) -> Tuple[TrainState, dict]:
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(
            params=params, opt_state=opt_state, step=state.step + 1
        ), metrics

    if mesh is None:
        return jax.jit(step)

    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        step,
        in_shardings=(replicated, batch_sharded),
        out_shardings=(replicated, replicated),
    )


def init_state(params, tx) -> TrainState:
    return TrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )
