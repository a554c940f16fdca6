"""Slim (narrow-width) model variable builders for integration tests.

The drivers infer geometry from variable trees (``s2v_tpu.models.*_arch``
helpers, ``LipSyncPipeline._*_arch``), so integration tests can exercise
structurally identical graphs at a fraction of the channel widths — the
1-CPU box compiles/runs them in seconds instead of minutes. Full production
geometry stays covered by the torch-parity suites (test_weight_parity,
test_gpen, test_gfpgan, test_retinaface, test_restoration_models)."""

import jax.numpy as jnp

# kwargs that pair with slim_gfpgan_vars when a driver takes explicit
# gfpgan_kwargs instead of inferring from the tree
SLIM_GFPGAN_KW = dict(num_style_feat=64, channel_multiplier=0.5, narrow=0.5)


def slim_retinaface_vars(key, hw=64):
    """cfg_mnet (MobileNetV1 x0.25) — the cheap RetinaFace config, and real
    coverage of the mnet backbone in the integration paths."""
    from s2v_tpu.models.retinaface import retinaface_mnet

    return retinaface_mnet().init(key, jnp.zeros((1, hw, hw, 3)))


def slim_facegan_vars(key, in_size=64):
    from s2v_tpu.models.gpen import FullGenerator

    return FullGenerator(size=in_size, narrow=0.25, channel_multiplier=0.5,
                         style_dim=64, n_mlp=2).init(
        key, jnp.zeros((1, in_size, in_size, 3)))


def slim_parsenet_vars(key, hw=512):
    from s2v_tpu.models.parsenet import ParseNet

    return ParseNet(base_ch=16, max_ch=32, min_ch=8, res_depth=2).init(
        key, jnp.zeros((1, hw, hw, 3)))


def slim_srmodel_vars(key, hw=48):
    from s2v_tpu.models.rrdbnet import RRDBNet

    return RRDBNet(scale=2, num_feat=16, num_block=2, num_grow_ch=8).init(
        key, jnp.zeros((1, hw, hw, 3)))


def slim_gfpgan_vars(key, size=64):
    from s2v_tpu.models.gfpgan import GFPGANv1Clean

    return GFPGANv1Clean(out_size=size, **SLIM_GFPGAN_KW).init(
        key, jnp.zeros((1, size, size, 3)))
