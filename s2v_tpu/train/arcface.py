"""Distributed face-recognition training — the arcface_torch harness
(reference: third_part/face3d/models/arcface_torch/train.py:21-133), rebuilt
as one SPMD program:

- IResNet backbone, batch (data) sharded — the DDP axis;
- PartialFC class-sharded margin softmax on the model axis
  (s2v_tpu.parallel.partial_fc), backward derived by AD through the
  collectives (reference hand-writes it, partial_fc.py:160-222);
- SGD + momentum with the reference's poly LR schedule, backbone and
  classifier updated in the same jitted step;
- throughput/verification/checkpoint callbacks via
  s2v_tpu.utils.diagnostics / checkpoint.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from s2v_tpu.models.iresnet import IResNet
from s2v_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from s2v_tpu.parallel.partial_fc import partial_fc_loss
from s2v_tpu.parallel.zero import shard_opt_state


class ArcFaceState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    clf_weight: jnp.ndarray  # [C, E] sharded on class axis
    opt_state: Any
    clf_opt_state: Any
    step: jnp.ndarray


def make_arcface_trainer(
    mesh: Mesh,
    num_classes: int,
    embedding_size: int = 512,
    layers: Tuple[int, ...] = (3, 4, 14, 3),
    lr: float = 0.02,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
    margin_kind: str = "arcface",
    rng: Optional[jax.Array] = None,
    sample_rate: float = 1.0,
    zero_opt: bool = True,
):
    """Returns (state, train_step) with state already device_put on the mesh.

    ``sample_rate < 1`` enables PartialFC negative-class sampling
    (arcface_torch partial_fc.py:100-123; speed_benchmark.md rows "Partial
    FC 0.1") — per-step random negatives keyed off the step counter.

    ``zero_opt`` shards the SGD momentum buffers over the data axis (the
    ZeRO-1 / DeepSpeed-engine analogue, parallel.zero) — params stay
    replicated; XLA all-gathers the updates. The classifier's momentum
    follows the classifier weight's model-axis sharding."""
    model = IResNet(layers=layers, num_features=embedding_size)
    rng = jax.random.PRNGKey(0) if rng is None else rng
    k1, k2, k_sample = jax.random.split(rng, 3)
    variables = model.init(k1, jnp.zeros((1, 112, 112, 3)), train=False)
    clf_weight = jax.random.normal(k2, (num_classes, embedding_size)) * 0.01

    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(lr, momentum=momentum),
    )
    clf_tx = optax.sgd(lr, momentum=momentum)

    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    clf_sh = NamedSharding(mesh, P(MODEL_AXIS, None))

    clf_weight_dev = jax.device_put(clf_weight, clf_sh)
    if zero_opt:
        opt0 = shard_opt_state(mesh, tx.init(variables["params"]))
        clf_opt0 = shard_opt_state(
            mesh, clf_tx.init(clf_weight), like=[clf_weight_dev])
    else:
        opt0 = jax.device_put(tx.init(variables["params"]), repl)
        clf_opt0 = jax.device_put(clf_tx.init(clf_weight), repl)

    state = ArcFaceState(
        params=jax.device_put(variables["params"], repl),
        batch_stats=jax.device_put(variables.get("batch_stats", {}), repl),
        clf_weight=clf_weight_dev,
        opt_state=opt0,
        clf_opt_state=clf_opt0,
        step=jax.device_put(jnp.zeros((), jnp.int32), repl),
    )

    clf_loss = functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(MODEL_AXIS, None), P()), out_specs=P(),
    )(lambda f, l, w, key: partial_fc_loss(
        f, l, w, margin_kind=margin_kind, sample_rate=sample_rate, rng=key))

    def loss_fn(params, clf_weight, batch_stats, images, labels, step):
        feats, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=True, mutable=["batch_stats"],
        )
        feats = feats * jax.lax.rsqrt(
            jnp.sum(feats * feats, axis=1, keepdims=True) + 1e-12
        )
        # negative-sampling key: derived from the trainer's rng (so seeds
        # vary the draws) folded with the step counter (so steps differ)
        loss = clf_loss(feats, labels, clf_weight,
                        jax.random.fold_in(k_sample, step))
        return loss, updates["batch_stats"]

    def train_step(state: ArcFaceState, images, labels):
        (loss, new_stats), (g_params, g_clf) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, state.clf_weight, state.batch_stats, images, labels,
          state.step)
        upd, opt_state = tx.update(g_params, state.opt_state, state.params)
        params = optax.apply_updates(state.params, upd)
        cupd, clf_opt_state = clf_tx.update(g_clf, state.clf_opt_state,
                                            state.clf_weight)
        clf_weight = optax.apply_updates(state.clf_weight, cupd)
        new_state = state.replace(
            params=params, batch_stats=new_stats, clf_weight=clf_weight,
            opt_state=opt_state, clf_opt_state=clf_opt_state,
            step=state.step + 1,
        )
        return new_state, {"loss": loss}

    state_sh = jax.tree_util.tree_map(lambda x: x.sharding, state)
    step_fn = jax.jit(
        train_step,
        in_shardings=(state_sh, data_sh, data_sh),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )
    return state, step_fn
