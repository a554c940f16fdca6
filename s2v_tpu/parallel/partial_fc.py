"""Class-sharded margin-softmax classifier — the TPU-native PartialFC.

The reference's one true tensor-parallel component is PartialFC
(third_part/face3d/models/arcface_torch/partial_fc.py:11-222): the final
face-recognition projection shards its [num_classes, emb] weight across ranks
(:59-60), all_gathers features/labels (:152,180-182), computes shard-local
logits + margin, stabilizes the softmax with all_reduce max / sum-exp
(:188-195), and hand-writes the backward with reduce_scatter of feature
gradients (:216-219).

Here the same math is a pure function inside ``shard_map`` over the mesh's
``model`` axis. The collectives (pmax/psum) appear exactly where the
reference placed its all_reduces — but the backward pass is *derived by
jax.grad through the collectives* instead of hand-written: psum
differentiates to psum, so the reduce_scatter of feature grads emerges from
AD.

Class sampling (PartialFC 0.1, partial_fc.py:100-123) is implemented with
static shapes: every shard keeps its positive classes and fills up to
``sample_rate * c_shard`` with random negatives via top_k on a scored
permutation (positives pinned at score 2.0 — the reference's exact trick,
partial_fc.py:112-114). The logits matmul and softmax then run at
[B, num_sample] instead of [B, c_shard] — the same FLOPs/activation-memory
scaling the reference's speed_benchmark.md:49-92 tables measure."""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from s2v_tpu.parallel.mesh import MODEL_AXIS


def _margin_logits(logits: jnp.ndarray, onehot: jnp.ndarray, margin_kind: str,
                   s: float, m: float) -> jnp.ndarray:
    """Apply ArcFace/CosFace margin to the target-class cosine logits."""
    if margin_kind == "none":
        return logits * s
    if margin_kind == "cosface":
        return s * (logits - onehot * m)
    if margin_kind == "arcface":
        cos = jnp.clip(logits, -1.0 + 1e-7, 1.0 - 1e-7)
        theta = jnp.arccos(cos)
        target = jnp.cos(theta + m)
        return s * jnp.where(onehot > 0, target, cos)
    raise ValueError(margin_kind)


def sample_classes(
    local_label: jnp.ndarray,  # [B] shard-local class ids (or out of range)
    in_shard: jnp.ndarray,     # [B] bool — label owned by this shard
    c_shard: int,
    num_sample: int,
    rng: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """PartialFC negative sampling (partial_fc.py:100-123), static shapes.

    Returns (index [num_sample] sorted selected class rows, remapped_label
    [B] positions of each positive label inside the selection). Positives
    are always selected: they get score 2.0 while negatives draw uniform
    [0, 1), then top_k keeps num_sample (the reference's perm trick,
    :112-114).
    """
    positive = jnp.zeros((c_shard,), jnp.float32).at[
        jnp.where(in_shard, local_label, c_shard)  # OOB drops
    ].max(jnp.where(in_shard, 1.0, 0.0), mode="drop")
    score = jax.random.uniform(rng, (c_shard,))
    score = jnp.where(positive > 0, 2.0, score)
    _, index = jax.lax.top_k(score, num_sample)
    index = jnp.sort(index)
    # remap each positive label to its position in the sorted selection
    remapped = jnp.searchsorted(index, local_label)
    return index, remapped


def partial_fc_loss(
    features: jnp.ndarray,     # [B, E] L2-normalized embeddings (replicated)
    labels: jnp.ndarray,       # [B] int32 global class ids (replicated)
    weight_shard: jnp.ndarray, # [C // num_shards, E] this shard's classes
    axis_name: str = MODEL_AXIS,
    margin_kind: str = "arcface",
    s: float = 64.0,
    m: float = 0.5,
    sample_rate: float = 1.0,
    rng: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean cross-entropy over the batch with a class-sharded weight.

    Runs *inside* shard_map/pmap over ``axis_name``. Differentiable in both
    features and weight_shard. ``sample_rate < 1`` enables PartialFC
    negative-class sampling (requires ``rng``; each shard perturbs it by its
    axis index so shards draw independent negatives).
    """
    shard_id = jax.lax.axis_index(axis_name)
    c_shard = weight_shard.shape[0]
    class_start = shard_id * c_shard

    local_label = labels - class_start
    in_shard = (local_label >= 0) & (local_label < c_shard)

    if sample_rate < 1.0:
        if rng is None:
            raise ValueError("sample_rate < 1 requires an rng key")
        num_sample = max(int(sample_rate * c_shard), 1)
        index, remapped = sample_classes(
            local_label, in_shard, c_shard,
            num_sample, jax.random.fold_in(rng, shard_id),
        )
        weight_shard = weight_shard[index]  # [num_sample, E]; grads scatter
        local_label = remapped
        n_classes = num_sample
    else:
        n_classes = c_shard

    wn = weight_shard * jax.lax.rsqrt(
        jnp.sum(weight_shard * weight_shard, axis=1, keepdims=True) + 1e-12
    )
    logits = features @ wn.T  # [B, n_classes] cosine similarities

    onehot = jax.nn.one_hot(
        jnp.where(in_shard, local_label, -1), n_classes, dtype=logits.dtype
    )
    logits = _margin_logits(logits, onehot, margin_kind, s, m)

    # Numerically stable global softmax (partial_fc.py:188-207 analogue).
    local_max = jnp.max(logits, axis=1)
    # The max-shift is a constant w.r.t. gradients; pmax has no VJP rule, so
    # cut the gradient before the collective.
    global_max = jax.lax.pmax(jax.lax.stop_gradient(local_max), axis_name)
    logits = logits - global_max[:, None]
    exp = jnp.exp(logits)
    denom = jax.lax.psum(jnp.sum(exp, axis=1), axis_name)  # [B]
    target_logit = jnp.sum(logits * onehot, axis=1)  # 0 where not in shard
    target_logit = jax.lax.psum(
        jnp.where(in_shard, target_logit, 0.0), axis_name
    )
    loss = jnp.log(denom) - target_logit
    return jnp.mean(loss)


def make_sharded_classifier(mesh: Mesh, margin_kind: str = "arcface",
                            s: float = 64.0, m: float = 0.5):
    """Return (loss_fn, grad_fn) over a class-sharded classifier.

    loss_fn(features [B,E], labels [B], weight [C,E]) -> scalar, with
    ``weight`` sharded on its class axis over the mesh's model axis. jit +
    shard_map handle the layout; gradients flow to features and weight.
    """

    ws_spec = P(MODEL_AXIS, None)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), ws_spec),
        out_specs=P(),
    )
    def _loss(features, labels, weight):
        val = partial_fc_loss(
            features, labels, weight,
            margin_kind=margin_kind, s=s, m=m,
        )
        # every shard computes the same scalar; keep one copy
        return val

    def loss_fn(features, labels, weight):
        return _loss(features, labels, weight)

    return jax.jit(loss_fn), jax.jit(jax.grad(loss_fn, argnums=(0, 2)))
