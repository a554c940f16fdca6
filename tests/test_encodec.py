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


def test_encodec_converter_parity_vs_transformers():
    """convert_encodec vs a random-init transformers EncodecModel (the
    encodec_24khz architecture): latents, codes, and decoded audio."""
    from transformers import EncodecConfig
    from transformers import EncodecModel as HFEncodec

    from s2v_tpu.utils.weights import convert_encodec

    torch.manual_seed(17)
    hf = HFEncodec(EncodecConfig()).eval()
    with torch.no_grad():  # HF random-init codebooks are zeros (kmeans-init
        for q in range(32):  # deferred) -> randomize so codes are non-trivial
            hf.quantizer.layers[q].codebook.embed.normal_(0, 1.0)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    from s2v_tpu.utils.weights import conversion_coverage

    converted, leftover = conversion_coverage(convert_encodec, sd)
    assert leftover == []
    variables = jax.tree_util.tree_map(jnp.asarray, converted)

    t = 3190  # not a hop multiple -> exercises the extra right padding
    wav = (RNG.randn(2, t, 1) * 0.3).astype(np.float32)
    x_t = torch.from_numpy(np.ascontiguousarray(wav.transpose(0, 2, 1)))

    with torch.no_grad():
        lat = hf.encoder(x_t)                                   # [B, 128, T']
        enc = hf.encode(x_t, bandwidth=24.0)
        codes_t = enc.audio_codes[0]                            # [B, n_q, T']
        dec = hf.decode(enc.audio_codes, [None]).audio_values   # [B, 1, T'*320]

    model = EncodecModel()
    recon, codes = jax.jit(model.apply)(variables, jnp.asarray(wav))
    lat_j = jax.jit(lambda v, w: model.apply(
        v, w, method=lambda m, w: m.encoder(w)))(variables, jnp.asarray(wav))

    np.testing.assert_allclose(
        np.asarray(lat_j).transpose(0, 2, 1), lat.numpy(), rtol=0, atol=2e-4
    )
    assert codes.shape == codes_t.shape == (2, 32, 10)
    assert len(np.unique(codes_t.numpy())) > 20  # guard against vacuity
    np.testing.assert_array_equal(np.asarray(codes), codes_t.numpy())
    n = min(recon.shape[1], dec.shape[2])
    np.testing.assert_allclose(
        np.asarray(recon)[:, :n, 0], dec.numpy()[:, 0, :n], rtol=0, atol=2e-4
    )


def test_encodec_converter_accepts_meta_layout():
    """The Meta encodec-package key scheme converts to the identical tree."""
    from transformers import EncodecConfig
    from transformers import EncodecModel as HFEncodec

    from s2v_tpu.utils.weights import convert_encodec

    torch.manual_seed(18)
    sd = {k: v.detach().numpy()
          for k, v in HFEncodec(EncodecConfig()).state_dict().items()}

    meta = {}
    for k, v in sd.items():
        mk = k.replace("encoder.layers.", "encoder.model.")
        mk = mk.replace("decoder.layers.", "decoder.model.")
        mk = mk.replace("quantizer.layers.", "quantizer.vq.layers.")
        mk = mk.replace(".codebook.", "._codebook.")
        if mk.startswith("decoder.model.") and ".block." not in mk \
                and ".shortcut." not in mk and ".lstm." not in mk \
                and int(mk.split(".")[2]) not in (0, 15):
            mk = mk.replace(".conv.", ".convtr.convtr.", 1)
        else:
            mk = mk.replace(".conv.", ".conv.conv.", 1)
        mk = mk.replace(".parametrizations.weight.original0", ".weight_g")
        mk = mk.replace(".parametrizations.weight.original1", ".weight_v")
        meta[mk] = v

    a = convert_encodec(sd)
    b = convert_encodec(meta)
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(leaf, flat_b[path])
