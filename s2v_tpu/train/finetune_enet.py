"""ENet fine-tuning on one video — training.py done correctly (reference:
training.py:189-471: Adam(lr 0.01), 10 epochs, only ENet's style convs
trainable via set_training_style, L1 + perceptual + identity-coefficient
losses over datagen batches).

The data comes from the same pipeline preprocessing as inference (Steps 0-5,
cached by ArtifactCache); the train step is a single jitted SPMD program
with the batch sharded on the mesh's data axis.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from s2v_tpu.models import ENet
from s2v_tpu.parallel.mesh import DATA_AXIS
from s2v_tpu.train.finetune import TrainState, init_state, style_conv_mask
from s2v_tpu.train.losses import l1_loss, perceptual_stub
from s2v_tpu.utils.config import TrainConfig


def make_id_embed_fn(recon_variables: Dict) -> Callable:
    """Identity embedding from the face3d coefficient regressor — the
    reference's "ArcFaceLoss" capability (training.py:47-92: ReconNet coeffs
    of the prediction, L2-compared; the reference code is WIP/broken — it
    wraps the net in no_grad and compares against raw images. Here the term
    is differentiable end-to-end). [B,384,384,3] in [0,1] -> [B,257]."""
    from s2v_tpu.models.resnet import ReconNet
    from s2v_tpu.ops.image import resize_bilinear

    model = ReconNet()

    def embed(pred01: jnp.ndarray) -> jnp.ndarray:
        return model.apply(recon_variables, resize_bilinear(pred01, (224, 224)))

    return embed


def make_enet_finetune_step(
    variables: Dict,
    cfg: TrainConfig,
    mesh: Optional[Mesh] = None,
    id_embed_fn: Optional[Callable] = None,
    vgg_variables: Optional[Dict] = None,
    lnet_res_blocks: int = 9,
):
    """Returns (state, step_fn). Batches: dict(mel [B,80,16,1],
    face [B,384,384,6], ref [B,384,384,3], target [B,384,384,3]).

    The perceptual term uses the converted torchvision VGG16
    (training.py:94-134) when ``vgg_variables`` is provided, otherwise the
    self-contained Laplacian-pyramid stand-in. ``id_embed_fn`` supplies the
    identity term (the reference's WIP "ArcFaceLoss", training.py:47-92 —
    a 3DMM/embedding distance; see cli.make_id_embed_fn)."""
    model = ENet(lnet_res_blocks=lnet_res_blocks)
    batch_stats = variables.get("batch_stats", {})

    # multi_transform: frozen params get zero updates (optax.masked would
    # pass raw gradients through as updates for the unmasked leaves)
    labels = jax.tree_util.tree_map(
        lambda trainable: "train" if trainable else "freeze",
        style_conv_mask(variables["params"]),
    )
    tx = optax.multi_transform(
        {"train": optax.adam(cfg.lr), "freeze": optax.set_to_zero()}, labels
    )
    state = init_state(variables["params"], tx)

    def loss_fn(params, batch):
        pred, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["mel"], batch["face"], batch["ref"],
        )
        loss_l1 = l1_loss(pred, batch["target"])
        if vgg_variables is not None:
            from s2v_tpu.models.vgg import vgg_perceptual_loss

            loss_p = vgg_perceptual_loss(vgg_variables, pred, batch["target"])
        else:
            loss_p = perceptual_stub(pred, batch["target"])
        loss = cfg.l1_weight * loss_l1 + cfg.perceptual_weight * loss_p
        metrics = {"l1": loss_l1, "perceptual": loss_p}
        if id_embed_fn is not None:
            ep = id_embed_fn(pred)
            et = jax.lax.stop_gradient(id_embed_fn(batch["target"]))
            loss_id = jnp.mean(jnp.square(ep - et))
            loss = loss + cfg.id_weight * loss_id
            metrics["id"] = loss_id
        metrics["loss"] = loss
        return loss, metrics

    def step(state: TrainState, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(
            params=params, opt_state=opt_state, step=state.step + 1
        ), metrics

    if mesh is None:
        return state, jax.jit(step)
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    state = jax.device_put(state, repl)
    return state, jax.jit(
        step,
        in_shardings=(repl, data_sh),
        out_shardings=(repl, repl),
    )


def finetune(
    variables: Dict,
    batches: Iterable[Dict[str, np.ndarray]],
    cfg: TrainConfig,
    mesh: Optional[Mesh] = None,
    checkpoint_dir: Optional[str] = None,
    log_path: Optional[str] = None,
    id_embed_fn: Optional[Callable] = None,
    vgg_variables: Optional[Dict] = None,
):
    """The training.py epoch loop (training.py:436-471)."""
    from s2v_tpu.utils.diagnostics import ThroughputLogger

    state, step_fn = make_enet_finetune_step(
        variables, cfg, mesh, id_embed_fn=id_embed_fn,
        vgg_variables=vgg_variables,
    )
    logger = ThroughputLogger(log_path, every=10)
    ckptr = None
    if checkpoint_dir is not None:
        from s2v_tpu.utils.checkpoint import TrainCheckpointer

        ckptr = TrainCheckpointer(checkpoint_dir)

    batches = list(batches)
    for epoch in range(cfg.epochs):
        for batch in batches:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step_fn(state, batch)
            logger.step(int(state.step), batch["mel"].shape[0],
                        {k: float(v) for k, v in metrics.items()})
        if ckptr is not None and (epoch + 1) % cfg.checkpoint_every == 0:
            ckptr.save(int(state.step), state)
    if ckptr is not None:
        ckptr.wait()
    return state
