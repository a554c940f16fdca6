"""Geometry inference from variable trees (the checkpoint-is-the-config
contract): converted production checkpoints must resolve to the reference
geometry, slim test trees to theirs, and the inferred module must rebuild a
shape-identical tree. Uses eval_shape trees — no compiles."""

import jax
import jax.numpy as jnp
import pytest

RNG = jax.random.PRNGKey(0)


def same_tree(a, b):
    return jax.tree_util.tree_all(
        jax.tree.map(lambda x, y: x.shape == y.shape, a, b))


def test_retinaface_arch_production_and_mnet():
    from s2v_tpu.models.retinaface import (
        RetinaFace, retinaface_arch, retinaface_mnet,
    )

    v = jax.eval_shape(RetinaFace().init, RNG, jnp.zeros((1, 64, 64, 3)))
    m = retinaface_arch(v)
    assert (m.backbone, m.out_channel) == ("resnet50", 256)
    v = jax.eval_shape(retinaface_mnet().init, RNG, jnp.zeros((1, 64, 64, 3)))
    m = retinaface_arch(v)
    assert (m.backbone, m.out_channel) == ("mobilenet0.25", 64)
    assert same_tree(v, jax.eval_shape(m.init, RNG, jnp.zeros((1, 64, 64, 3))))


def test_fullgenerator_arch_production_and_slim():
    from s2v_tpu.models.gpen import FullGenerator, fullgenerator_arch

    v = jax.eval_shape(FullGenerator(size=512).init, RNG,
                       jnp.zeros((1, 512, 512, 3)))
    m = fullgenerator_arch(v, size=512)
    assert (m.narrow, m.channel_multiplier, m.style_dim, m.n_mlp) == (
        1.0, 2, 512, 8)

    slim = FullGenerator(size=64, narrow=0.25, channel_multiplier=0.5,
                         n_mlp=2)
    v = jax.eval_shape(slim.init, RNG, jnp.zeros((1, 64, 64, 3)))
    m = fullgenerator_arch(v, size=64)
    assert (m.narrow, m.channel_multiplier, m.n_mlp) == (0.25, 0.5, 2)
    assert same_tree(v, jax.eval_shape(m.init, RNG, jnp.zeros((1, 64, 64, 3))))


def test_parsenet_arch_production_and_slim():
    from s2v_tpu.models.parsenet import ParseNet, parsenet_arch

    x = jnp.zeros((1, 512, 512, 3))
    v = jax.eval_shape(ParseNet().init, RNG, x)
    m = parsenet_arch(v)
    assert (m.base_ch, m.max_ch, m.res_depth, m.parsing_ch) == (
        64, 256, 10, 19)
    assert same_tree(v, jax.eval_shape(m.init, RNG, x))

    slim = ParseNet(base_ch=16, max_ch=32, min_ch=8, res_depth=2)
    v = jax.eval_shape(slim.init, RNG, x)
    m = parsenet_arch(v)
    assert (m.base_ch, m.max_ch, m.res_depth) == (16, 32, 2)
    assert same_tree(v, jax.eval_shape(m.init, RNG, x))


def test_gfpgan_arch_clean_and_original():
    from s2v_tpu.models.gfpgan import GFPGANv1, GFPGANv1Clean, gfpgan_arch

    v = jax.eval_shape(GFPGANv1Clean().init, RNG, jnp.zeros((1, 512, 512, 3)))
    m = gfpgan_arch(v, arch="clean", out_size=512)
    assert (m.narrow, m.channel_multiplier, m.num_style_feat, m.num_mlp) == (
        1.0, 2, 512, 8)

    slim = GFPGANv1Clean(out_size=64, narrow=0.5, channel_multiplier=0.5,
                         num_style_feat=64, num_mlp=2)
    v = jax.eval_shape(slim.init, RNG, jnp.zeros((1, 64, 64, 3)))
    m = gfpgan_arch(v, arch="clean", out_size=64)
    # num_mlp is uninferable (and unused) under input_is_latent=True — the
    # style MLP branch creates no params; the default (8) changes nothing
    assert (m.narrow, m.channel_multiplier, m.num_style_feat) == (
        0.5, 0.5, 64)
    assert same_tree(v, jax.eval_shape(m.init, RNG, jnp.zeros((1, 64, 64, 3))))

    # the GFPGANv1.pth configuration (gfpgan/utils.py:63-74)
    prod = GFPGANv1(input_is_latent=True, different_w=True, sft_half=True,
                    channel_multiplier=1)
    v = jax.eval_shape(prod.init, RNG, jnp.zeros((1, 512, 512, 3)))
    m = gfpgan_arch(v, arch="original", out_size=512, input_is_latent=True,
                    different_w=True, sft_half=True)
    assert (m.narrow, m.channel_multiplier, m.num_style_feat) == (1.0, 1, 512)


def test_rrdbnet_arch_production_and_slim():
    from s2v_tpu.models.rrdbnet import RRDBNet, rrdbnet_arch

    x = jnp.zeros((1, 24, 24, 3))
    v = jax.eval_shape(RRDBNet(scale=2, num_feat=32).init, RNG, x)
    m = rrdbnet_arch(v, scale=2)
    assert (m.num_feat, m.num_block, m.num_grow_ch) == (32, 23, 32)

    v = jax.eval_shape(RRDBNet(scale=2, num_feat=16, num_block=2,
                               num_grow_ch=8).init, RNG, x)
    m = rrdbnet_arch(v, scale=2)
    assert (m.num_feat, m.num_block, m.num_grow_ch) == (16, 2, 8)
    assert same_tree(v, jax.eval_shape(m.init, RNG, x))


def test_pipeline_arch_inference_production():
    """The LipSyncPipeline staticmethods resolve production trees (from
    eval_shape of the production modules) to production geometry."""
    from s2v_tpu.models import DNet, ENet
    from s2v_tpu.models.resnet import ReconNet
    from s2v_tpu.pipeline.inference import LipSyncPipeline

    v = jax.eval_shape(ReconNet().init, RNG, jnp.zeros((1, 224, 224, 3)))
    m = LipSyncPipeline._recon_arch(v)
    assert (tuple(m.layers), m.base_planes) == ((3, 4, 6, 3), 64)

    v = jax.eval_shape(DNet().init, RNG, jnp.zeros((1, 256, 256, 3)),
                       jnp.zeros((1, 26, 73)))
    m = LipSyncPipeline._dnet_arch(v)
    assert (m.descriptor_nc, m.warp_base_nc, m.edit_base_nc, m.max_nc) == (
        256, 32, 64, 256)

    v = jax.eval_shape(
        ENet(lnet_res_blocks=2).init, RNG, jnp.zeros((1, 80, 16, 1)),
        jnp.zeros((1, 384, 384, 6)), jnp.zeros((1, 384, 384, 3)))
    m = LipSyncPipeline._enet_arch(v)
    assert (m.lnet_res_blocks, m.num_style_feat, m.narrow,
            m.channel_multiplier, m.lnet_base_nc, m.lnet_max_nc) == (
        2, 512, 1.0, 2.0, 64, 512)
