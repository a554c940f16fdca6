"""Optimizer-state sharding — the ZeRO / DeepSpeed-engine analogue
(reference: third_part/emb/utils/engines.py:19 wraps DeepSpeedEngine; ds
config emb/config.py:62-82).

DeepSpeed's ZeRO stage 1 partitions optimizer state (momentum / Adam
moments) across data-parallel ranks and all-gathers the updated parameters
each step. The TPU-native equivalent needs no hand-written partitioning
loop: give each optimizer-state leaf a sharded ``NamedSharding`` over the
mesh's data axis and let XLA's SPMD partitioner place the update math on
the shards and insert the all-gather where the (replicated) parameters are
rebuilt. The train step itself is unchanged — sharding is purely an
annotation (SURVEY §2 "optax + orbax with optimizer-state sharding").

``zero_shardings`` mirrors an arbitrary optax state pytree: any float
array leaf big enough to be worth splitting whose leading divisible axis
fits the mesh axis gets ``P(axis, ...)`` on that dimension; everything
else (scalars, step counters, small biases) stays replicated. Leaves that
already carry a non-trivial sharding (e.g. the PartialFC class-sharded
classifier's momentum, which must follow its weight's model-axis layout)
can be pinned via ``like``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from s2v_tpu.parallel.mesh import DATA_AXIS


def _leaf_spec(shape, axis_size: int, min_size: int, axis_name: str):
    """First dimension divisible by the axis size gets sharded."""
    if int(np.prod(shape)) < min_size:
        return P()
    for d, n in enumerate(shape):
        if n % axis_size == 0 and n >= axis_size:
            return P(*([None] * d + [axis_name]))
    return P()


def zero_shardings(
    mesh: Mesh,
    tree: Any,
    axis: str = DATA_AXIS,
    min_size: int = 1024,
    like: Optional[Any] = None,
) -> Any:
    """Pytree of NamedSharding for an optimizer-state (or param) tree.

    ``like``: optional pytree of arrays whose shardings take precedence for
    leaves of matching shape (by object identity walk is impossible across
    trees of different structure, so shape-matching is used: an opt-state
    leaf shaped exactly like a ``like`` leaf inherits that leaf's sharding
    — this keeps e.g. momentum of a model-parallel weight on the model
    axis, the layout PartialFC persists per-rank in the reference,
    partial_fc.py:62-63)."""
    axis_size = mesh.shape[axis]
    pinned = {}
    if like is not None:
        for leaf in jax.tree_util.tree_leaves(like):
            sh = getattr(leaf, "sharding", None)
            if isinstance(sh, NamedSharding) and sh.spec != P():
                pinned[tuple(leaf.shape)] = sh

    def one(leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        if tuple(leaf.shape) in pinned:
            return pinned[tuple(leaf.shape)]
        return NamedSharding(
            mesh, _leaf_spec(leaf.shape, axis_size, min_size, axis))

    return jax.tree_util.tree_map(one, tree)


def shard_opt_state(
    mesh: Mesh,
    opt_state: Any,
    axis: str = DATA_AXIS,
    min_size: int = 1024,
    like: Optional[Any] = None,
) -> Any:
    """device_put an optimizer state with ZeRO-style shardings."""
    return jax.device_put(
        opt_state, zero_shardings(mesh, opt_state, axis, min_size, like))
