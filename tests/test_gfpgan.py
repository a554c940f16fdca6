"""GFPGANv1Clean parity vs the reference torch implementation (imported with
basicsr stubs, noise weights are zero-init so random-init parity is exact)."""

import importlib.util
import sys
import types

import numpy as np
import torch

import jax
import jax.numpy as jnp

from s2v_tpu.models.gfpgan import GFPGANv1Clean
from s2v_tpu.utils.weights import convert_gfpgan_clean

RNG = np.random.RandomState(66)


def _stub_basicsr():
    if "basicsr.utils.registry" in sys.modules:
        return
    if "basicsr" not in sys.modules:
        sys.modules["basicsr"] = types.ModuleType("basicsr")
    utils = types.ModuleType("basicsr.utils")
    registry = types.ModuleType("basicsr.utils.registry")

    class _Registry:
        def register(self, obj=None):
            if obj is None:
                return lambda o: o
            return obj

    registry.ARCH_REGISTRY = _Registry()
    utils.registry = registry
    sys.modules["basicsr.utils"] = utils
    sys.modules["basicsr.utils.registry"] = registry
    # arch_util stub (reused by other parity tests if not yet installed)
    if "basicsr.archs.arch_util" not in sys.modules:
        archs = types.ModuleType("basicsr.archs")
        arch_util = types.ModuleType("basicsr.archs.arch_util")

        def default_init_weights(module_list, scale=1, bias_fill=0, **kwargs):
            import torch.nn as nn

            if not isinstance(module_list, list):
                module_list = [module_list]
            for module in module_list:
                mods = module.modules() if hasattr(module, "modules") else [module]
                for m in mods:
                    if isinstance(m, (nn.Conv2d, nn.Linear)) and m.bias is not None:
                        m.bias.data.fill_(bias_fill)

        arch_util.default_init_weights = default_init_weights
        archs.arch_util = arch_util
        sys.modules["basicsr.archs"] = archs
        sys.modules["basicsr.archs.arch_util"] = arch_util


def load_ref_gfpgan():
    _stub_basicsr()
    base = "/root/reference/third_part/GFPGAN/gfpgan/archs"
    spec2 = importlib.util.spec_from_file_location(
        "gfpgan_archs.stylegan2_clean_arch", f"{base}/stylegan2_clean_arch.py"
    )
    sg = importlib.util.module_from_spec(spec2)
    sys.modules["gfpgan_archs.stylegan2_clean_arch"] = sg
    spec2.loader.exec_module(sg)
    # gfpganv1_clean_arch does a relative import; load it as part of a
    # synthetic package
    pkg = types.ModuleType("gfpgan_archs")
    pkg.__path__ = [base]
    sys.modules["gfpgan_archs"] = pkg
    spec1 = importlib.util.spec_from_file_location(
        "gfpgan_archs.gfpganv1_clean_arch", f"{base}/gfpganv1_clean_arch.py"
    )
    g = importlib.util.module_from_spec(spec1)
    sys.modules["gfpgan_archs.gfpganv1_clean_arch"] = g
    spec1.loader.exec_module(g)
    return g.GFPGANv1Clean


def test_gfpgan_clean_parity():
    torch.manual_seed(9)
    RefGFPGAN = load_ref_gfpgan()
    # small out_size keeps the test fast; same code path as 512
    ref = RefGFPGAN(
        out_size=64, num_style_feat=128, channel_multiplier=2,
        decoder_load_path=None, fix_decoder=False, num_mlp=4,
        input_is_latent=True, different_w=True, narrow=1, sft_half=True,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_gfpgan_clean(sd, out_size=64, num_mlp=4)

    model = GFPGANv1Clean(out_size=64, num_style_feat=128,
                          channel_multiplier=2, num_mlp=4,
                          input_is_latent=True, different_w=True,
                          narrow=1, sft_half=True)

    x = (RNG.rand(2, 64, 64, 3).astype(np.float32) - 0.5) * 2
    with torch.no_grad():
        want, _ = ref(
            torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))),
            randomize_noise=False,
        )
    # stored noises are random but noise weights are zero-init => inert
    got = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x),
        deterministic=True,
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.numpy().shape
    np.testing.assert_allclose(got, want.numpy(), rtol=0, atol=5e-3)


def test_gfpgan_clean_parity_merged_conditions():
    """narrow=0.5 / out_size=128 makes the finest scales hit the fused
    scale+shift condition pipeline (2*ch <= 128); parity must hold there
    too (the production 512 config hits it at the 256/512 scales)."""
    torch.manual_seed(11)
    RefGFPGAN = load_ref_gfpgan()
    ref = RefGFPGAN(
        out_size=128, num_style_feat=128, channel_multiplier=2,
        decoder_load_path=None, fix_decoder=False, num_mlp=4,
        input_is_latent=True, different_w=True, narrow=0.5, sft_half=True,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_gfpgan_clean(sd, out_size=128, num_mlp=4)

    model = GFPGANv1Clean(out_size=128, num_style_feat=128,
                          channel_multiplier=2, num_mlp=4,
                          input_is_latent=True, different_w=True,
                          narrow=0.5, sft_half=True)

    x = (RNG.rand(2, 128, 128, 3).astype(np.float32) - 0.5) * 2
    with torch.no_grad():
        want, _ = ref(
            torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))),
            randomize_noise=False,
        )
    got = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x),
        deterministic=True,
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.numpy().shape
    np.testing.assert_allclose(got, want.numpy(), rtol=0, atol=5e-3)
