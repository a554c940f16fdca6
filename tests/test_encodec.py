"""EnCodec-compatible codec tests: LSTM vs torch oracle, causal conv
semantics, RVQ invariants, end-to-end code shapes (75 Hz framing)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from s2v_tpu.models.encodec import (
    HOP,
    LSTM,
    EncodecModel,
    ResidualVQ,
    causal_pad,
)

RNG = np.random.RandomState(201)


def test_lstm_matches_torch():
    c, hdim, t, b = 12, 12, 9, 2
    torch.manual_seed(71)
    ref = torch.nn.LSTM(c, hdim, batch_first=True)
    x = RNG.randn(b, t, c).astype(np.float32)
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(x))
    params = {
        "weight_ih": ref.weight_ih_l0.detach().numpy().T,
        "weight_hh": ref.weight_hh_l0.detach().numpy().T,
        "bias_ih": ref.bias_ih_l0.detach().numpy(),
        "bias_hh": ref.bias_hh_l0.detach().numpy(),
    }
    got = LSTM(hdim).apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)


def test_causal_pad_matches_torch_causal_conv():
    """EnCodec causal conv: output length ceil(T/stride), only past context."""
    x = RNG.randn(1, 50, 1).astype(np.float32)
    for k, s in [(7, 1), (4, 2), (8, 4), (10, 5), (16, 8)]:
        padded = causal_pad(jnp.asarray(x), k, s)
        out_len = (padded.shape[1] - k) // s + 1
        assert out_len == int(np.ceil(50 / s)), (k, s, out_len)


def test_rvq_invariants():
    vq = ResidualVQ(n_q=4, codebook_size=16, dimension=8)
    z = jnp.asarray(RNG.randn(2, 10, 8).astype(np.float32))
    var = vq.init(jax.random.PRNGKey(0), z)
    q, codes = vq.apply(var, z)
    assert codes.shape == (2, 4, 10)
    assert codes.dtype in (jnp.int32, jnp.int64)
    # more codebooks => smaller residual
    q1, _ = vq.apply(var, z, n_q=1)
    err4 = float(jnp.mean(jnp.square(z - q)))
    err1 = float(jnp.mean(jnp.square(z - q1)))
    assert err4 <= err1


def test_encode_shapes_75hz():
    model = EncodecModel(n_q=8)
    wav = jnp.asarray(RNG.randn(1, 4800, 1).astype(np.float32))  # 0.2 s @ 24k
    var = model.init(jax.random.PRNGKey(0), wav)
    codes = model.apply(var, wav, method=EncodecModel.encode)
    # 0.2 s at 75 Hz = 15 frames — the reference's (1, 32, 15) assert
    # (audio2codes.py:55) with n_q=8 here
    assert codes.shape == (1, 8, 15)
    recon = model.apply(var, codes, method=EncodecModel.decode_codes)
    assert recon.shape[1] == 15 * HOP
