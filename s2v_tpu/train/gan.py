"""Adversarial restoration training — the GPEN harness
(reference: third_part/GPEN/train_simple.py:69-280) as SPMD jitted steps.

Losses, exactly as the reference:
- D: logistic (softplus(-real) + softplus(fake)), lazy R1 gradient penalty
  every d_reg_every steps (train_simple.py:69-82, 197-203)
- G: non-saturating softplus(-fake) + smooth-L1 + identity-embedding loss
  (train_simple.py:85-93)
- EMA generator (accumulate, decay 0.5^(32/10000), train_simple.py:54-60)

DDP == batch sharding on the mesh's data axis; XLA inserts the gradient
all-reduces the reference gets from torch DDP + its hand-rolled
reduce_loss_dict (GPEN/distributed.py).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from s2v_tpu.parallel.mesh import DATA_AXIS


def d_logistic_loss(real_pred, fake_pred):
    return (jax.nn.softplus(-real_pred).mean()
            + jax.nn.softplus(fake_pred).mean())


def g_nonsaturating_loss(fake_pred):
    return jax.nn.softplus(-fake_pred).mean()


def smooth_l1(a, b, beta: float = 1.0):
    d = jnp.abs(a - b)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


def r1_penalty(disc_apply, d_params, real):
    """d_r1_loss (train_simple.py:76-82): ||d D(x)/dx||^2."""
    def score(x):
        return disc_apply(d_params, x).sum()

    grad = jax.grad(score)(real)
    return jnp.sum(jnp.square(grad.reshape(grad.shape[0], -1)), axis=1).mean()


def ema_update(ema_params, params, decay):
    """accumulate() (train_simple.py:54-60)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema_params, params
    )


class GANState(struct.PyTreeNode):
    g_params: Any
    d_params: Any
    g_ema: Any
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray


def make_gan_trainer(
    gen_apply: Callable,     # (params, lq_images) -> fake images
    disc_apply: Callable,    # (params, images) -> [B, 1] logits
    g_params: Any,
    d_params: Any,
    mesh: Optional[Mesh] = None,
    g_lr: float = 2e-3,
    d_lr: float = 2e-3,
    r1_weight: float = 10.0,
    d_reg_every: int = 16,
    l1_weight: float = 1.0,
    id_weight: float = 1.0,
    id_embed_fn: Optional[Callable] = None,
    ema_kimg: float = 10.0,
):
    """Returns (state, d_step, g_step) jitted update functions.

    Batches: dict(lq [B,H,W,3], hq [B,H,W,3]) in [-1, 1].
    """
    g_tx = optax.adam(g_lr, b1=0.0, b2=0.99)
    d_tx = optax.adam(d_lr, b1=0.0, b2=0.99)
    ema_decay = 0.5 ** (32.0 / (ema_kimg * 1000.0))

    state = GANState(
        g_params=g_params, d_params=d_params, g_ema=g_params,
        g_opt=g_tx.init(g_params), d_opt=d_tx.init(d_params),
        step=jnp.zeros((), jnp.int32),
    )

    def d_loss_fn(d_params, g_params, batch, do_r1):
        fake = jax.lax.stop_gradient(gen_apply(g_params, batch["lq"]))
        real_pred = disc_apply(d_params, batch["hq"])
        fake_pred = disc_apply(d_params, fake)
        loss = d_logistic_loss(real_pred, fake_pred)
        r1 = jax.lax.cond(
            do_r1,
            lambda: r1_penalty(disc_apply, d_params, batch["hq"]),
            lambda: jnp.asarray(0.0),
        )
        # lazy regularization (train_simple.py:197-203)
        loss = loss + do_r1 * (r1_weight / 2.0) * r1 * d_reg_every
        return loss, {"d_loss": loss, "r1": r1}

    def g_loss_fn(g_params, d_params, batch):
        fake = gen_apply(g_params, batch["lq"])
        fake_pred = disc_apply(d_params, fake)
        loss = g_nonsaturating_loss(fake_pred)
        loss_l1 = smooth_l1(fake, batch["hq"])
        loss = loss + l1_weight * loss_l1
        metrics = {"g_adv": loss, "l1": loss_l1}
        if id_embed_fn is not None:
            ef = id_embed_fn(fake)
            er = jax.lax.stop_gradient(id_embed_fn(batch["hq"]))
            loss_id = jnp.mean(1.0 - jnp.sum(ef * er, axis=-1))
            loss = loss + id_weight * loss_id
            metrics["id"] = loss_id
        metrics["g_loss"] = loss
        return loss, metrics

    def d_step(state: GANState, batch):
        do_r1 = (state.step % d_reg_every == 0).astype(jnp.float32)
        (_, metrics), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params, state.g_params, batch, do_r1
        )
        upd, d_opt = d_tx.update(grads, state.d_opt, state.d_params)
        return state.replace(
            d_params=optax.apply_updates(state.d_params, upd), d_opt=d_opt
        ), metrics

    def g_step(state: GANState, batch):
        (_, metrics), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params, state.d_params, batch
        )
        upd, g_opt = g_tx.update(grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, upd)
        g_ema = ema_update(state.g_ema, g_params, ema_decay)
        return state.replace(
            g_params=g_params, g_opt=g_opt, g_ema=g_ema, step=state.step + 1
        ), metrics

    if mesh is None:
        return state, jax.jit(d_step), jax.jit(g_step)
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    state = jax.device_put(state, repl)
    batch_sh = {"lq": data_sh, "hq": data_sh}
    return (
        state,
        jax.jit(d_step, in_shardings=(repl, batch_sh),
                out_shardings=(repl, repl)),
        jax.jit(g_step, in_shardings=(repl, batch_sh),
                out_shardings=(repl, repl)),
    )
