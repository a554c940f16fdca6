"""Deep3DFaceRecon training step (reference: face3d/models/facerecon_model.py
:17-140 — ReconNet regresses 257 coeffs; losses combine arcface feature
cosine, masked photometric error on the nvdiffrast render, weighted landmark
MSE, and coefficient/gamma/reflectance regularization; the reference trains
it DDP+SyncBN, base_model.py:107-124).

TPU version: one jitted SPMD step — ReconNet forward, BFM geometry, the JAX
rasterizer, all losses — batch sharded on the data axis.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from s2v_tpu.models.bfm import ParametricFaceModel, rasterize
from s2v_tpu.models.resnet import ReconNet
from s2v_tpu.pipeline.utils import split_coeff
from s2v_tpu.train.face3d_losses import (
    landmark_loss,
    perceptual_loss,
    photo_loss,
    reflectance_loss,
    reg_loss,
)

# facerecon_model.py default loss weights (w_feat 0.2, w_color 1.92,
# w_reg 3e-4, w_gamma 10, w_lm 1.6e-3, w_reflc 5)
DEFAULT_WEIGHTS = dict(feat=0.2, color=1.92, reg=3.0e-4, gamma=10.0,
                       lm=1.6e-3, reflc=5.0)


def make_face3d_train_step(
    face_model: ParametricFaceModel,
    skin_mask: Optional[np.ndarray] = None,
    id_embed_fn: Optional[Callable] = None,
    lr: float = 1e-4,
    image_size: int = 224,
    weights: Optional[Dict[str, float]] = None,
    render_faces: Optional[np.ndarray] = None,
):
    """Returns (init_fn, step_fn). Batches: dict(image [B,224,224,3] in
    [0,1], gt_lm [B,68,2], mask [B,224,224,1] skin-region)."""
    w = dict(DEFAULT_WEIGHTS, **(weights or {}))
    model = ReconNet()
    # near-degenerate triangles give the rasterizer unbounded barycentric
    # gradients; clip like the reference's AMP grad scaling does implicitly
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    faces = face_model.d.face_buf if render_faces is None else render_faces

    def init_fn(rng):
        variables = model.init(rng, jnp.zeros((1, image_size, image_size, 3)))
        return {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
            "opt": tx.init(variables["params"]),
            "step": jnp.zeros((), jnp.int32),
        }

    def loss_fn(params, batch_stats, batch):
        coeffs, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], train=True, mutable=["batch_stats"],
        )
        cdict = split_coeff(coeffs)
        vertex, texture, color, pred_lm = face_model.compute_for_render(coeffs)
        render, mask_r = rasterize(vertex, faces, color, image_size)
        render_mask = mask_r * batch.get(
            "mask", jnp.ones_like(mask_r)
        )

        loss_color = photo_loss(render, batch["image"], render_mask)
        loss_lm = landmark_loss(pred_lm, batch["gt_lm"])
        creg, gamma = reg_loss(cdict)
        loss = (w["color"] * loss_color + w["lm"] * loss_lm
                + w["reg"] * creg + w["gamma"] * gamma)
        metrics = {"color": loss_color, "lm": loss_lm, "reg": creg,
                   "gamma": gamma}
        if skin_mask is not None:
            reflc = reflectance_loss(texture, jnp.asarray(skin_mask))
            loss = loss + w["reflc"] * reflc
            metrics["reflc"] = reflc
        if id_embed_fn is not None:
            feat = perceptual_loss(id_embed_fn(render),
                                   jax.lax.stop_gradient(
                                       id_embed_fn(batch["image"])))
            loss = loss + w["feat"] * feat
            metrics["feat"] = feat
        metrics["loss"] = loss
        return loss, (metrics, updates["batch_stats"])

    @jax.jit
    def step_fn(state, batch):
        (_, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state["params"], state["batch_stats"], batch)
        upd, opt = tx.update(grads, state["opt"], state["params"])
        return {
            "params": optax.apply_updates(state["params"], upd),
            "batch_stats": new_stats,
            "opt": opt,
            "step": state["step"] + 1,
        }, metrics

    return init_fn, step_fn
