"""GPEN parity vs the reference torch implementation (gpen_model.py imported
with its own CPU fallbacks for the fused/upfirdn ops)."""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from s2v_tpu.models.gpen import (
    Discriminator,
    FullGenerator,
    FullGeneratorSR,
    upsample2,
    downsample2,
)
from s2v_tpu.utils.weights import convert_gpen_full

RNG = np.random.RandomState(88)

GPEN_DIR = "/root/reference/third_part/GPEN/face_model"


def load_ref_gpen():
    if GPEN_DIR not in sys.path:
        sys.path.insert(0, GPEN_DIR)
    import gpen_model  # noqa: F401

    return gpen_model


def test_full_generator_parity():
    gm = load_ref_gpen()
    torch.manual_seed(13)
    ref = gm.FullGenerator(size=64, style_dim=64, n_mlp=2,
                           channel_multiplier=1, narrow=0.5).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_gpen_full(sd, size=64, n_mlp=2)

    model = FullGenerator(size=64, style_dim=64, n_mlp=2,
                          channel_multiplier=1, narrow=0.5)
    x = (RNG.rand(2, 64, 64, 3).astype(np.float32) - 0.5) * 2
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
    got = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x),
        deterministic=True,
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.numpy().shape
    np.testing.assert_allclose(got, want.numpy(), rtol=0, atol=5e-3)


def test_full_generator_sr_parity():
    gm = load_ref_gpen()
    torch.manual_seed(14)
    ref = gm.FullGenerator_SR(in_size=32, out_size=64, style_dim=64, n_mlp=2,
                              channel_multiplier=1, narrow=0.5).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_gpen_full(sd, size=64, n_mlp=2, in_size=32)

    model = FullGeneratorSR(in_size=32, out_size=64, style_dim=64, n_mlp=2,
                            channel_multiplier=1, narrow=0.5)
    x = (RNG.rand(1, 32, 32, 3).astype(np.float32) - 0.5) * 2
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
    got = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x),
        deterministic=True,
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.numpy().shape
    np.testing.assert_allclose(got, want.numpy(), rtol=0, atol=5e-3)


def test_upsample_downsample_match_reference():
    gm = load_ref_gpen()
    x = RNG.randn(2, 4, 16, 16).astype(np.float32)
    up = gm.Upsample([1, 3, 3, 1])
    down = gm.Downsample([1, 3, 3, 1])
    with torch.no_grad():
        want_up = up(torch.from_numpy(x)).numpy()
        want_down = down(torch.from_numpy(x)).numpy()
    got_up = np.asarray(upsample2(jnp.asarray(x.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    got_down = np.asarray(downsample2(jnp.asarray(x.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_up, want_up, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_down, want_down, rtol=1e-4, atol=1e-4)


def test_discriminator_shapes():
    model = Discriminator(size=64, channel_multiplier=1, narrow=0.5)
    x = jnp.zeros((4, 64, 64, 3))
    var = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(var, x)
    assert out.shape == (4, 1)


def test_gfpgan_v1_original_parity():
    """GFPGANv1 (ORIGINAAL basicsr arch) vs a torch twin assembled from the
    reference GPEN StyleGAN2 classes (same rosinality math as
    basicsr.archs.stylegan2_arch), structured per gfpganv1_arch.py:221-404.
    Twin keys are renamed to the basicsr convention the converter targets."""
    import math

    import torch.nn as tnn
    import torch.nn.functional as F

    from s2v_tpu.models.gfpgan import GFPGANv1
    from s2v_tpu.utils.weights import conversion_coverage, convert_gfpgan_v1

    gm = load_ref_gpen()
    out_size, style_feat, num_mlp, cm, narrow = 64, 512, 2, 1, 1.0
    log_size = int(math.log2(out_size))

    def channels(nw):
        return {k: int(v * nw) for k, v in
                {4: 512, 8: 512, 16: 512, 32: 512, 64: 256 * cm,
                 128: 128 * cm, 256: 64 * cm, 512: 32 * cm}.items()}

    class TConvUp(tnn.Module):
        def __init__(self, cin, cout, k, p=0, bias=True, activate=True):
            super().__init__()
            self.scale = 1 / math.sqrt(cin * k * k)
            self.padding = p
            self.weight = tnn.Parameter(torch.randn(cout, cin, k, k))
            self.bias = None
            self.activation = (gm.FusedLeakyReLU(cout) if activate and bias
                               else None)

        def forward(self, x):
            out = F.interpolate(x, scale_factor=2, mode="bilinear",
                                align_corners=False)
            out = F.conv2d(out, self.weight * self.scale, bias=self.bias,
                           padding=self.padding)
            return self.activation(out) if self.activation else out

    class TResUp(tnn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv1 = gm.ConvLayer(cin, cin, 3, bias=True, activate=True)
            self.conv2 = TConvUp(cin, cout, 3, 1)
            self.skip = TConvUp(cin, cout, 1, bias=False, activate=False)

        def forward(self, x):
            return (self.conv2(self.conv1(x)) + self.skip(x)) / math.sqrt(2)

    class TSFTGen(tnn.Module):
        def __init__(self):
            super().__init__()
            ch = channels(narrow)
            layers = [gm.PixelNorm()]
            for _ in range(num_mlp):
                layers.append(gm.EqualLinear(style_feat, style_feat,
                                             lr_mul=0.01,
                                             activation="fused_lrelu"))
            self.style_mlp = tnn.Sequential(*layers)
            self.constant_input = gm.ConstantInput(ch[4])
            self.style_conv1 = gm.StyledConv(ch[4], ch[4], 3, style_feat,
                                             isconcat=False)
            self.to_rgb1 = gm.ToRGB(ch[4], style_feat, upsample=False)
            self.style_convs = tnn.ModuleList()
            self.to_rgbs = tnn.ModuleList()
            cin = ch[4]
            for r in range(3, log_size + 1):
                cout = ch[2 ** r]
                self.style_convs.append(gm.StyledConv(
                    cin, cout, 3, style_feat, upsample=True, isconcat=False))
                self.style_convs.append(gm.StyledConv(
                    cout, cout, 3, style_feat, isconcat=False))
                self.to_rgbs.append(gm.ToRGB(cout, style_feat))
                cin = cout

        def forward(self, style, conditions):
            latent = self.style_mlp(style)
            n_latent = log_size * 2 - 2
            latent = latent.unsqueeze(1).repeat(1, n_latent, 1)
            out = self.constant_input(latent)
            z = lambda t: torch.zeros(
                t.shape[0], 1, t.shape[2], t.shape[3])
            out = self.style_conv1(out, latent[:, 0],
                                   noise=torch.zeros(out.shape[0], 1, 4, 4))
            skip = self.to_rgb1(out, latent[:, 1])
            i = 1
            for c1, c2, to_rgb in zip(self.style_convs[::2],
                                      self.style_convs[1::2], self.to_rgbs):
                out = c1(out, latent[:, i],
                         noise=torch.zeros(out.shape[0], 1,
                                           out.shape[2] * 2, out.shape[3] * 2))
                if i < len(conditions):
                    out = out * conditions[i - 1] + conditions[i]
                out = c2(out, latent[:, i + 1], noise=z(out))
                skip = to_rgb(out, latent[:, i + 2], skip)
                i += 2
            return skip

    class TGFPGANv1(tnn.Module):
        def __init__(self):
            super().__init__()
            ch = channels(narrow * 0.5)
            self.conv_body_first = gm.ConvLayer(3, ch[out_size], 1,
                                                bias=True, activate=True)
            self.conv_body_down = tnn.ModuleList()
            cin = ch[out_size]
            for i in range(log_size, 2, -1):
                cout = ch[2 ** (i - 1)]
                self.conv_body_down.append(gm.ResBlock(cin, cout,
                                                       (1, 3, 3, 1)))
                cin = cout
            self.final_conv = gm.ConvLayer(cin, ch[4], 3, bias=True,
                                           activate=True)
            self.final_linear = gm.EqualLinear(ch[4] * 16, style_feat)
            self.conv_body_up = tnn.ModuleList()
            self.toRGB = tnn.ModuleList()
            self.condition_scale = tnn.ModuleList()
            self.condition_shift = tnn.ModuleList()
            cin = ch[4]
            for i in range(3, log_size + 1):
                cout = ch[2 ** i]
                self.conv_body_up.append(TResUp(cin, cout))
                self.toRGB.append(gm.EqualConv2d(cout, 3, 1, bias=True))
                for ml in (self.condition_scale, self.condition_shift):
                    ml.append(tnn.Sequential(
                        gm.EqualConv2d(cout, cout, 3, padding=1, bias=True),
                        gm.ScaledLeakyReLU(0.2),
                        gm.EqualConv2d(cout, cout * 2, 3, padding=1,
                                       bias=True)))
                cin = cout
            self.stylegan_decoder = TSFTGen()

        def forward(self, x):
            feat = self.conv_body_first(x)
            skips = []
            for blk in self.conv_body_down:
                feat = blk(feat)
                skips.insert(0, feat)
            feat = self.final_conv(feat)
            style = self.final_linear(feat.view(feat.size(0), -1))
            conditions, rgbs = [], []
            for i, up in enumerate(self.conv_body_up):
                feat = feat + skips[i]
                feat = up(feat)
                conditions.append(self.condition_scale[i](feat))
                conditions.append(self.condition_shift[i](feat))
                rgbs.append(self.toRGB[i](feat))
            return self.stylegan_decoder(style, conditions), rgbs

    torch.manual_seed(51)
    ref = TGFPGANv1().eval()
    sd = {}
    for k, t in ref.state_dict().items():
        if k.startswith("stylegan_decoder."):
            k = k.replace(".conv.", ".modulated_conv.")
            k = k.replace(".noise.weight", ".weight")
            k = k.replace("constant_input.input", "constant_input.weight")
        sd[k] = t.detach().numpy()
    variables, leftover = conversion_coverage(
        convert_gfpgan_v1, sd, out_size=out_size, num_mlp=num_mlp)
    assert leftover == []

    model = GFPGANv1(out_size=out_size, num_mlp=num_mlp,
                     channel_multiplier=cm, narrow=narrow)
    x = (RNG.rand(1, out_size, out_size, 3).astype(np.float32) - 0.5) * 2
    with torch.no_grad():
        want, want_rgbs = ref(torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
    got, got_rgbs = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x))
    assert len(got_rgbs) == len(want_rgbs) == log_size - 2
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want.numpy(),
        rtol=0, atol=5e-3)
    for g, w in zip(got_rgbs, want_rgbs):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   w.numpy(), rtol=0, atol=5e-3)
