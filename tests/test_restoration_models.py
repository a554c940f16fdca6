"""ParseNet + RRDBNet parity vs reference torch modules."""

import importlib.util
import sys
import types

import numpy as np
import torch

import jax
import jax.numpy as jnp

from s2v_tpu.models.parsenet import MOUTH_COLORMAP, ParseNet, parse_mask
from s2v_tpu.models.rrdbnet import RRDBNet, pixel_unshuffle
from s2v_tpu.utils.weights import convert_parsenet, convert_rrdbnet

RNG = np.random.RandomState(99)


def load_module(name, path, extra_path=None):
    if extra_path and extra_path not in sys.path:
        sys.path.insert(0, extra_path)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_parsenet_parity():
    torch.manual_seed(21)
    pm = load_module(
        "ref_parse_model",
        "/root/reference/third_part/GPEN/face_parse/parse_model.py",
        extra_path="/root/reference/third_part/GPEN/face_parse",
    )
    # small config, same code path: in/out 64, min_feat 32 -> 1 down/1 up
    ref = pm.ParseNet(64, 64, 32, 16, 19, norm_type="bn",
                      relu_type="LeakyReLU", ch_range=[8, 32]).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_parsenet(sd, down_steps=1, up_steps=1)

    model = ParseNet(64, 64, 32, 16, 19, min_ch=8, max_ch=32)
    x = (RNG.rand(2, 64, 64, 3).astype(np.float32) - 0.5) * 2
    with torch.no_grad():
        want_mask, want_img = ref(
            torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
        )
    got_mask, got_img = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(got_mask).transpose(0, 3, 1, 2), want_mask.numpy(),
        rtol=0, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(got_img).transpose(0, 3, 1, 2), want_img.numpy(),
        rtol=0, atol=2e-3,
    )
    # mask colormap semantics
    m = parse_mask(got_mask, MOUTH_COLORMAP)
    assert m.shape == (2, 64, 64)
    assert set(np.unique(np.asarray(m))).issubset({0.0, 255.0})


def test_rrdbnet_parity():
    torch.manual_seed(22)
    rm = load_module(
        "ref_rrdbnet",
        "/root/reference/third_part/GPEN/sr_model/rrdbnet_arch.py",
        extra_path="/root/reference/third_part/GPEN/sr_model",
    )
    ref = rm.RRDBNet(3, 3, scale=2, num_feat=16, num_block=2, num_grow_ch=8).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_rrdbnet(sd, num_block=2)

    model = RRDBNet(scale=2, num_feat=16, num_block=2, num_grow_ch=8)
    x = RNG.rand(1, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))).numpy()
    got = np.asarray(
        model.apply(jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x))
    ).transpose(0, 3, 1, 2)
    assert got.shape == want.shape  # x2: 32 -> 64
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-3)


def test_pixel_unshuffle_matches_torch():
    x = RNG.rand(1, 8, 8, 3).astype(np.float32)
    want = torch.nn.functional.pixel_unshuffle(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 2
    ).numpy()
    got = np.asarray(pixel_unshuffle(jnp.asarray(x), 2)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_tile_process_matches_whole_image():
    """Tiling a linear 'SR' model reproduces the untiled result exactly for
    interior-consistent ops (here: nearest x2 upsample)."""
    from s2v_tpu.models.rrdbnet import tile_process

    img = RNG.rand(1, 70, 50, 3).astype(np.float32)

    def sr(tile):
        return np.repeat(np.repeat(tile, 2, axis=1), 2, axis=2)

    out = tile_process(sr, img, scale=2, tile_size=32, tile_pad=4)
    want = sr(img)
    np.testing.assert_allclose(out, want, rtol=1e-6, atol=1e-6)
