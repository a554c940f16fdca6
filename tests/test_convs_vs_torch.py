"""Golden tests: conv primitives vs torch CPU."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from s2v_tpu.ops.convs import (
    conv1d,
    conv2d,
    conv_transpose2d,
    torch_conv_weight_to_hwio,
    torch_convtranspose_weight_to_hwoi,
)

RNG = np.random.RandomState(7)


def test_conv2d_matches_torch():
    x = RNG.randn(2, 17, 13, 6).astype(np.float32)
    w = RNG.randn(8, 6, 3, 3).astype(np.float32)  # OIHW
    b = RNG.randn(8).astype(np.float32)
    want = F.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
        torch.from_numpy(b), stride=2, padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(
        conv2d(jnp.asarray(x), jnp.asarray(torch_conv_weight_to_hwio(w)),
               jnp.asarray(b), stride=2, padding=1)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv2d_reflect_matches_torch():
    """FFC convs use padding_mode='reflect' (models/ffc.py:198)."""
    x = RNG.randn(2, 12, 12, 4).astype(np.float32)
    w = RNG.randn(5, 4, 3, 3).astype(np.float32)
    conv = torch.nn.Conv2d(4, 5, 3, padding=1, padding_mode="reflect", bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
    want = conv(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)
    got = np.asarray(
        conv2d(jnp.asarray(x), jnp.asarray(torch_conv_weight_to_hwio(w)),
               padding=1, padding_mode="reflect")
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv1d_dilated_matches_torch():
    """MappingNet uses Conv1d k3 dilation 3 (models/DNet.py:42)."""
    x = RNG.randn(2, 27, 73).astype(np.float32)  # NLC
    w = RNG.randn(256, 73, 7).astype(np.float32)  # O,I,k
    b = RNG.randn(256).astype(np.float32)
    want = F.conv1d(
        torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(w),
        torch.from_numpy(b),
    ).numpy().transpose(0, 2, 1)
    got = np.asarray(
        conv1d(jnp.asarray(x), jnp.asarray(w.transpose(2, 1, 0)), jnp.asarray(b))
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    w2 = RNG.randn(16, 73, 3).astype(np.float32)
    want2 = F.conv1d(
        torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(w2), dilation=3
    ).numpy().transpose(0, 2, 1)
    got2 = np.asarray(conv1d(jnp.asarray(x), jnp.asarray(w2.transpose(2, 1, 0)), dilation=3))
    np.testing.assert_allclose(got2, want2, rtol=1e-3, atol=1e-3)


def test_conv_transpose2d_matches_torch():
    """ADAINDecoderBlock upsampling: k3 s2 p1 op1 (base_blocks.py:224)."""
    x = RNG.randn(2, 8, 8, 6).astype(np.float32)
    w = RNG.randn(6, 4, 3, 3).astype(np.float32)  # torch [I,O,kh,kw]
    b = RNG.randn(4).astype(np.float32)
    want = F.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
        torch.from_numpy(b), stride=2, padding=1, output_padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(
        conv_transpose2d(
            jnp.asarray(x), jnp.asarray(torch_convtranspose_weight_to_hwoi(w)),
            jnp.asarray(b), stride=2, padding=1, output_padding=1,
        )
    )
    assert got.shape == want.shape == (2, 16, 16, 4)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv2d_s2d_path_matches_torch():
    """The opt-in space-to-depth 3x3 path (convs.py _conv3x3_s2d,
    S2V_S2D_CONV=1 — measured slower on v5e, see the module comment) must
    stay numerically equivalent to torch F.conv2d on the same weights."""
    import s2v_tpu.ops.convs as cv

    x = RNG.randn(1, 160, 162, 24).astype(np.float32)
    w = RNG.randn(16, 24, 3, 3).astype(np.float32)
    b = RNG.randn(16).astype(np.float32)
    want = F.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
        torch.from_numpy(b), stride=1, padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    prev = cv._S2D_ENABLE
    cv._S2D_ENABLE = True
    try:
        assert 160 * 162 >= cv._S2D_MIN_PIXELS  # gate takes the packed branch
        got = np.asarray(
            conv2d(jnp.asarray(x), jnp.asarray(torch_conv_weight_to_hwio(w)),
                   jnp.asarray(b), stride=1, padding=1)
        )
        # odd spatial size must fall back to the direct lowering
        x_odd = RNG.randn(1, 161, 162, 24).astype(np.float32)
        got_odd = np.asarray(
            conv2d(jnp.asarray(x_odd),
                   jnp.asarray(torch_conv_weight_to_hwio(w)), padding=1))
    finally:
        cv._S2D_ENABLE = prev
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert got_odd.shape == (1, 161, 162, 16)
