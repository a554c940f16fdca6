"""GANimation training losses + solver step (reference:
third_part/ganimation_replicate/model/ganimation.py:50-117 +
base_model.py:148-164, wgan-gp configuration).

Forward (ganimation.py:50-58): generate fake = att*src + (1-att)*color from
target AUs, then reconstruct real from the fake with the source AUs.
D: wgan loss on real/fake + AU regression MSE on real + gradient penalty at
random interpolates. G: wgan fake score + AU regression on fake + L1 cycle
reconstruction + attention-mask sparsity + total-variation smoothness.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def tv_loss(mask: jnp.ndarray) -> jnp.ndarray:
    """Total variation on [B,H,W,1] attention masks (criterionTV)."""
    dh = jnp.mean(jnp.square(mask[:, 1:] - mask[:, :-1]))
    dw = jnp.mean(jnp.square(mask[:, :, 1:] - mask[:, :, :-1]))
    return dh + dw


def wgan_gradient_penalty(disc_apply: Callable, d_params, real, fake,
                          rng) -> jnp.ndarray:
    """base_model.py:148-164: (||dD/dx at interpolates|| - 1)^2."""
    alpha = jax.random.uniform(rng, (real.shape[0], 1, 1, 1))
    inter = alpha * real + (1 - alpha) * fake

    def score_sum(x):
        pred, _ = disc_apply(d_params, x)
        return jnp.sum(pred)

    grads = jax.grad(score_sum)(inter)
    norms = jnp.sqrt(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2, axis=1)
                     + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


def ganimation_d_loss(
    disc_apply: Callable, d_params,
    gen_apply: Callable, g_params,
    src_img, src_aus, tar_aus, rng,
    lambda_dis: float = 1.0, lambda_aus: float = 160.0,
    lambda_gp: float = 10.0,
) -> Tuple[jnp.ndarray, Dict]:
    """backward_dis (ganimation.py:60-78). gen_apply returns
    (color, attention, feats); disc_apply returns (score, aus_pred)."""
    color, att, _ = gen_apply(g_params, src_img, tar_aus)
    fake = jax.lax.stop_gradient(att * src_img + (1 - att) * color)

    pred_real, real_aus = disc_apply(d_params, src_img)
    pred_fake, _ = disc_apply(d_params, fake)
    # wgan criterionGAN: real -> -mean(pred), fake -> +mean(pred)
    loss_real = -jnp.mean(pred_real)
    loss_fake = jnp.mean(pred_fake)
    loss_aus = jnp.mean(jnp.square(real_aus - src_aus))
    gp = wgan_gradient_penalty(disc_apply, d_params, src_img, fake, rng)
    loss = (lambda_dis * (loss_fake + loss_real) + lambda_aus * loss_aus
            + lambda_gp * gp)
    return loss, {"d_real": loss_real, "d_fake": loss_fake,
                  "d_aus": loss_aus, "gp": gp, "d_total": loss}


def ganimation_g_loss(
    gen_apply: Callable, g_params,
    disc_apply: Callable, d_params,
    src_img, src_aus, tar_aus,
    lambda_dis: float = 1.0, lambda_aus: float = 160.0,
    lambda_rec: float = 10.0, lambda_mask: float = 0.1,
    lambda_tv: float = 1e-5,
) -> Tuple[jnp.ndarray, Dict]:
    """backward_gen (ganimation.py:80-101) with the cycle reconstruction."""
    color, att, _ = gen_apply(g_params, src_img, tar_aus)
    fake = att * src_img + (1 - att) * color
    rec_color, rec_att, _ = gen_apply(g_params, fake, src_aus)
    rec = rec_att * fake + (1 - rec_att) * rec_color

    pred_fake, fake_aus = disc_apply(d_params, fake)
    loss_gan = -jnp.mean(pred_fake)
    loss_aus = jnp.mean(jnp.square(fake_aus - tar_aus))
    loss_rec = jnp.mean(jnp.abs(rec - src_img))
    loss_mask = jnp.mean(att) + jnp.mean(rec_att)
    loss_tv = tv_loss(att) + tv_loss(rec_att)
    loss = (lambda_dis * loss_gan + lambda_aus * loss_aus
            + lambda_rec * loss_rec + lambda_mask * loss_mask
            + lambda_tv * loss_tv)
    return loss, {"g_gan": loss_gan, "g_aus": loss_aus, "g_rec": loss_rec,
                  "g_mask": loss_mask, "g_tv": loss_tv, "g_total": loss}


# ---------------------------------------------------------------------------
# StarGAN variant (ganimation_replicate/model/stargan.py — same split
# generator/discriminator, different objective: the generator's color output
# IS the fake image, no attention composition and no mask/TV terms)
# ---------------------------------------------------------------------------


def stargan_d_loss(
    disc_apply: Callable, d_params,
    gen_apply: Callable, g_params,
    src_img, src_aus, tar_aus, rng,
    lambda_dis: float = 1.0, lambda_aus: float = 160.0,
    lambda_gp: float = 10.0,
) -> Tuple[jnp.ndarray, Dict]:
    """stargan.py:57-76 backward_dis (wgan-gp configuration)."""
    fake, _, _ = gen_apply(g_params, src_img, tar_aus)
    fake = jax.lax.stop_gradient(fake)

    pred_real, real_aus = disc_apply(d_params, src_img)
    pred_fake, _ = disc_apply(d_params, fake)
    loss_real = -jnp.mean(pred_real)
    loss_fake = jnp.mean(pred_fake)
    loss_aus = jnp.mean(jnp.square(real_aus - src_aus))
    gp = wgan_gradient_penalty(disc_apply, d_params, src_img, fake, rng)
    loss = (lambda_dis * (loss_fake + loss_real) + lambda_aus * loss_aus
            + lambda_gp * gp)
    return loss, {"d_real": loss_real, "d_fake": loss_fake,
                  "d_aus": loss_aus, "gp": gp, "d_total": loss}


def stargan_g_loss(
    gen_apply: Callable, g_params,
    disc_apply: Callable, d_params,
    src_img, src_aus, tar_aus,
    lambda_dis: float = 1.0, lambda_aus: float = 160.0,
    lambda_rec: float = 10.0,
) -> Tuple[jnp.ndarray, Dict]:
    """stargan.py:78-93 backward_gen: GAN + AU regression + cycle L1."""
    fake, _, _ = gen_apply(g_params, src_img, tar_aus)
    rec, _, _ = gen_apply(g_params, fake, src_aus)

    pred_fake, fake_aus = disc_apply(d_params, fake)
    loss_gan = -jnp.mean(pred_fake)
    loss_aus = jnp.mean(jnp.square(fake_aus - tar_aus))
    loss_rec = jnp.mean(jnp.abs(rec - src_img))
    loss = lambda_dis * loss_gan + lambda_aus * loss_aus + lambda_rec * loss_rec
    return loss, {"g_gan": loss_gan, "g_aus": loss_aus, "g_rec": loss_rec,
                  "g_total": loss}


def make_expression_trainer(
    gen_apply: Callable, disc_apply: Callable,
    g_params, d_params,
    model: str = "ganimation",
    lr: float = 1e-4, beta1: float = 0.5,
):
    """optimize_paras (stargan.py:95-108 / ganimation.py:103-116): one jitted
    D step per batch, G every `train_gen` call. `model` picks the objective
    ('ganimation' composes via attention; 'stargan' uses the raw output)."""
    import optax

    g_tx = optax.adam(lr, b1=beta1, b2=0.999)
    d_tx = optax.adam(lr, b1=beta1, b2=0.999)
    d_loss = ganimation_d_loss if model == "ganimation" else stargan_d_loss
    g_loss = ganimation_g_loss if model == "ganimation" else stargan_g_loss

    state = {"g": g_params, "d": d_params,
             "g_opt": g_tx.init(g_params), "d_opt": d_tx.init(d_params)}

    @jax.jit
    def d_step(state, src_img, src_aus, tar_aus, rng):
        (_, metrics), grads = jax.value_and_grad(
            lambda dp: d_loss(disc_apply, dp, gen_apply, state["g"],
                              src_img, src_aus, tar_aus, rng), has_aux=True
        )(state["d"])
        upd, d_opt = d_tx.update(grads, state["d_opt"], state["d"])
        return dict(state, d=optax.apply_updates(state["d"], upd),
                    d_opt=d_opt), metrics

    @jax.jit
    def g_step(state, src_img, src_aus, tar_aus):
        (_, metrics), grads = jax.value_and_grad(
            lambda gp: g_loss(gen_apply, gp, disc_apply, state["d"],
                              src_img, src_aus, tar_aus), has_aux=True
        )(state["g"])
        upd, g_opt = g_tx.update(grads, state["g_opt"], state["g"])
        return dict(state, g=optax.apply_updates(state["g"], upd),
                    g_opt=g_opt), metrics

    return state, d_step, g_step
