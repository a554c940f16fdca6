"""GFPGAN training components (reference: GFPGAN/gfpgan/models/
gfpgan_model.py:19-553 + archs/gfpganv1_arch.py:405-439).

- FacialComponentDiscriminator: the VGG-style eyes/mouth discriminator
  (blur-downsample ConvLayers — reuses the GPEN ConvLayer, identical math).
- roi_crop: ROI extraction for left-eye/right-eye/mouth crops from face
  landmark boxes (gfpgan_model.py:235-266 get_roi_regions).
- gram matrix + the component style loss (gfpgan_model.py:267-281, 362-380:
  feature-matching on discriminator features via Gram matrices).
- make_gfpgan_steps: generator step combining pixel L1, perceptual (VGG),
  global + component GAN losses, identity loss; discriminator steps.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from s2v_tpu.models.gpen import ConvLayer
from s2v_tpu.train.gan import d_logistic_loss, g_nonsaturating_loss


class FacialComponentDiscriminator(nn.Module):
    """gfpganv1_arch.py:405-439."""

    @nn.compact
    def __call__(self, x, return_feats: bool = False):
        feat = ConvLayer(64, 3, name="conv1")(x)
        feat = ConvLayer(128, 3, downsample=True, name="conv2")(feat)
        feat = ConvLayer(128, 3, name="conv3")(feat)
        feats = [feat]
        feat = ConvLayer(256, 3, downsample=True, name="conv4")(feat)
        feat = ConvLayer(256, 3, name="conv5")(feat)
        feats.append(feat)
        out = ConvLayer(1, 3, activate=False, name="final_conv")(feat)
        if return_feats:
            return out, feats
        return out, None


def roi_crop(images: jnp.ndarray, centers: jnp.ndarray, size: int) -> jnp.ndarray:
    """Fixed-size ROI crops around per-image centers (get_roi_regions
    equivalent with static shapes: the reference uses ROIAlign on variable
    boxes; TPU-first we crop a fixed window around the landmark center).

    images [B,H,W,C]; centers [B,2] (x, y) pixels -> [B,size,size,C]."""
    b, h, w, c = images.shape
    half = size // 2
    x0 = jnp.clip(centers[:, 0].astype(jnp.int32) - half, 0, w - size)
    y0 = jnp.clip(centers[:, 1].astype(jnp.int32) - half, 0, h - size)

    def crop_one(img, y, x):
        return jax.lax.dynamic_slice(img, (y, x, 0), (size, size, c))

    return jax.vmap(crop_one)(images, y0, x0)


def gram_mat(x: jnp.ndarray) -> jnp.ndarray:
    """gfpgan_model.py:267-281. x [B,H,W,C] -> [B,C,C] / (C*H*W)."""
    b, h, w, c = x.shape
    feat = x.reshape(b, h * w, c)
    return jnp.einsum("bnc,bnd->bcd", feat, feat) / (c * h * w)


def component_style_loss(feats_fake, feats_real) -> jnp.ndarray:
    """gfpgan_model.py:362-380: L1 between Gram matrices of the component
    discriminator's two feature levels."""
    loss = 0.0
    for f, r in zip(feats_fake, feats_real):
        loss = loss + jnp.mean(
            jnp.abs(gram_mat(f) - jax.lax.stop_gradient(gram_mat(r)))
        )
    return loss


def make_gfpgan_g_loss(
    disc_apply: Callable,
    comp_discs: Dict[str, Tuple[Callable, Any]],  # name -> (apply, params)
    vgg_loss_fn: Optional[Callable] = None,
    id_embed_fn: Optional[Callable] = None,
    pixel_weight: float = 0.1,
    perceptual_weight: float = 1.0,
    gan_weight: float = 0.1,
    comp_gan_weight: float = 1.0,
    comp_style_weight: float = 200.0,
    id_weight: float = 10.0,
):
    """The generator objective of gfpgan_model.py:283-404. comp_discs maps
    'left_eye'/'right_eye'/'mouth' to (apply_fn, params); rois maps the same
    names to (fake_crop, real_crop) pairs provided by the caller."""

    def loss_fn(fake, real, d_params, rois: Dict[str, Tuple]):
        loss = pixel_weight * jnp.mean(jnp.abs(fake - real))
        metrics = {"pixel": loss}
        if vgg_loss_fn is not None:
            p = vgg_loss_fn(fake, real)
            loss = loss + perceptual_weight * p
            metrics["percep"] = p
        adv = g_nonsaturating_loss(disc_apply(d_params, fake))
        loss = loss + gan_weight * adv
        metrics["adv"] = adv
        for name, (apply_fn, params) in comp_discs.items():
            fcrop, rcrop = rois[name]
            pred, feats_f = apply_fn(params, fcrop, True)
            _, feats_r = apply_fn(params, rcrop, True)
            comp_adv = g_nonsaturating_loss(pred)
            comp_style = component_style_loss(feats_f, feats_r)
            loss = loss + comp_gan_weight * comp_adv + comp_style_weight * comp_style
            metrics[f"{name}_adv"] = comp_adv
        if id_embed_fn is not None:
            ef = id_embed_fn(fake)
            er = jax.lax.stop_gradient(id_embed_fn(real))
            lid = jnp.mean(jnp.abs(ef - er))
            loss = loss + id_weight * lid
            metrics["id"] = lid
        metrics["g_total"] = loss
        return loss, metrics

    return loss_fn


# ---------------------------------------------------------------------------
# Assembled training loop (gfpgan_model.py optimize_parameters flow)
# ---------------------------------------------------------------------------


def make_gfpgan_trainer(
    gen_apply: Callable,       # (g_params, lq) -> restored
    disc_apply: Callable,      # (d_params, img) -> [B,1] logits
    comp_apply: Callable,      # (c_params, crop, return_feats) -> (out, feats)
    g_params: Any,
    d_params: Any,
    comp_params: Dict[str, Any],   # left_eye / right_eye / mouth
    vgg_loss_fn: Optional[Callable] = None,
    id_embed_fn: Optional[Callable] = None,
    g_lr: float = 2e-3,
    d_lr: float = 2e-3,
    roi_sizes: Optional[Dict[str, int]] = None,
    net_d_iters: int = 1,
    net_d_init_iters: int = 0,
):
    """GFPGANModel.optimize_parameters (gfpgan_model.py:283-450): one G step
    (pixel + perceptual + global/component GAN + component style + id) and
    one global-D + per-component-D step.

    Batches: dict(lq, gt [B,S,S,3] in [-1,1], loc_{name} [B,2] ROI centers).
    Returns (state dict, g_step, d_step).
    """
    import optax

    from flax import struct

    roi_sizes = roi_sizes or {"left_eye": 80, "right_eye": 80, "mouth": 120}
    g_tx = optax.adam(g_lr, b1=0.9, b2=0.99)
    d_tx = optax.adam(d_lr, b1=0.9, b2=0.99)

    comp_fns = {
        name: ((lambda p, x, rf, _n=name: comp_apply(p, x, rf)),
               comp_params[name])
        for name in comp_params
    }

    def rois_for(fake, real, batch):
        out = {}
        for name, size in roi_sizes.items():
            centers = batch[f"loc_{name}"]
            out[name] = (roi_crop(fake, centers, size),
                         roi_crop(real, centers, size))
        return out

    g_loss_core = make_gfpgan_g_loss(
        disc_apply,
        {n: (fn, p) for n, (fn, p) in comp_fns.items()},
        vgg_loss_fn=vgg_loss_fn, id_embed_fn=id_embed_fn,
    )

    def g_loss_fn(g_params, d_params, batch):
        fake = gen_apply(g_params, batch["lq"])
        rois = rois_for(fake, batch["gt"], batch)
        return g_loss_core(fake, batch["gt"], d_params, rois)

    def d_loss_fn(d_params, comp_ps, g_params, batch):
        from s2v_tpu.train.gan import d_logistic_loss

        fake = jax.lax.stop_gradient(gen_apply(g_params, batch["lq"]))
        loss = d_logistic_loss(
            disc_apply(d_params, batch["gt"]), disc_apply(d_params, fake)
        )
        metrics = {"d_global": loss}
        rois = rois_for(fake, batch["gt"], batch)
        for name in comp_ps:
            fcrop, rcrop = rois[name]
            pred_r, _ = comp_apply(comp_ps[name], rcrop, False)
            pred_f, _ = comp_apply(comp_ps[name], fcrop, False)
            l = d_logistic_loss(pred_r, pred_f)
            loss = loss + l
            metrics[f"d_{name}"] = l
        metrics["d_total"] = loss
        return loss, metrics

    state = {
        "g": g_params, "d": d_params, "comp": comp_params,
        "g_opt": g_tx.init(g_params),
        "d_opt": d_tx.init((d_params, comp_params)),
        "step": 0,
    }

    @jax.jit
    def g_step(state, batch):
        (_, metrics), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state["g"], state["d"], batch
        )
        upd, g_opt = g_tx.update(grads, state["g_opt"], state["g"])
        state = dict(state, g=optax.apply_updates(state["g"], upd),
                     g_opt=g_opt, step=state["step"] + 1)
        return state, metrics

    @jax.jit
    def d_step(state, batch):
        (_, metrics), grads = jax.value_and_grad(
            lambda dc, g, b: d_loss_fn(dc[0], dc[1], g, b), has_aux=True
        )((state["d"], state["comp"]), state["g"], batch)
        upd, d_opt = d_tx.update(grads, state["d_opt"],
                                 (state["d"], state["comp"]))
        new_d, new_comp = optax.apply_updates((state["d"], state["comp"]), upd)
        state = dict(state, d=new_d, comp=new_comp, d_opt=d_opt)
        return state, metrics

    return state, g_step, d_step
