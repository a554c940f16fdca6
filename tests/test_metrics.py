"""Metric tests: PSNR closed form, SSIM vs torch-computed reference
formulation, SyncNet shapes, LSE behavior."""

import numpy as np

import jax
import jax.numpy as jnp

from s2v_tpu.pipeline.metrics import SyncNet, lse_metrics, psnr, ssim

RNG = np.random.RandomState(211)


def test_psnr_closed_form():
    a = jnp.zeros((1, 8, 8, 3))
    b = jnp.full((1, 8, 8, 3), 10.0)
    want = 10 * np.log10(255.0 ** 2 / 100.0)
    np.testing.assert_allclose(float(psnr(a, b)), want, rtol=1e-6)
    assert float(psnr(a, a)) > 100  # identical -> huge psnr


def test_ssim_bounds_and_identity():
    x = jnp.asarray(RNG.rand(1, 32, 32, 3).astype(np.float32) * 255)
    np.testing.assert_allclose(float(ssim(x, x)), 1.0, rtol=1e-5)
    y = jnp.asarray(RNG.rand(1, 32, 32, 3).astype(np.float32) * 255)
    s = float(ssim(x, y))
    assert -1.0 <= s < 0.5  # random images are dissimilar


def test_syncnet_shapes():
    model = SyncNet()
    face = jnp.zeros((2, 48, 96, 15))
    mel = jnp.zeros((2, 80, 16, 1))
    var = model.init(jax.random.PRNGKey(0), face, mel)
    fe, ae = model.apply(var, face, mel)
    assert fe.shape == (2, 512) and ae.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(fe), axis=1), 1.0,
                               rtol=1e-4)


def test_lse_metrics_prefer_synced():
    n, e = 40, 16
    audio = RNG.randn(n, e).astype(np.float32)
    audio /= np.linalg.norm(audio, axis=1, keepdims=True)
    synced = audio + RNG.randn(n, e) * 0.05
    synced /= np.linalg.norm(synced, axis=1, keepdims=True)
    shifted = np.roll(synced, 5, axis=0)

    d_sync, c_sync = lse_metrics(synced, audio)
    d_off, c_off = lse_metrics(shifted, audio)
    assert d_sync < d_off          # synced pairs are closer
    assert c_sync > 0


def test_syncnet_converter_parity():
    """Parity vs a torch twin of wav2lip's SyncNet_color."""
    import torch
    import torch.nn as tnn

    from s2v_tpu.utils.weights import convert_syncnet

    class TConv(tnn.Module):
        def __init__(self, cin, cout, k, s, p, residual=False):
            super().__init__()
            self.conv_block = tnn.Sequential(
                tnn.Conv2d(cin, cout, k, s, p), tnn.BatchNorm2d(cout)
            )
            self.act = tnn.ReLU()
            self.residual = residual

        def forward(self, x):
            out = self.conv_block(x)
            if self.residual:
                out = out + x
            return self.act(out)

    face_specs = [
        (15, 32, 7, 1, 3, False),
        (32, 64, 5, (1, 2), 1, False), (64, 64, 3, 1, 1, True), (64, 64, 3, 1, 1, True),
        (64, 128, 3, 2, 1, False), (128, 128, 3, 1, 1, True), (128, 128, 3, 1, 1, True),
        (128, 256, 3, 2, 1, False), (256, 256, 3, 1, 1, True), (256, 256, 3, 1, 1, True),
        (256, 512, 3, 2, 1, False), (512, 512, 3, 1, 1, True), (512, 512, 3, 1, 1, True),
        (512, 512, 3, 2, 1, False), (512, 512, 3, 1, 0, False),
    ]
    audio_specs = [
        (1, 32, 3, 1, 1, False), (32, 32, 3, 1, 1, True), (32, 32, 3, 1, 1, True),
        (32, 64, 3, (3, 1), 1, False), (64, 64, 3, 1, 1, True), (64, 64, 3, 1, 1, True),
        (64, 128, 3, 3, 1, False), (128, 128, 3, 1, 1, True), (128, 128, 3, 1, 1, True),
        (128, 256, 3, (3, 2), 1, False), (256, 256, 3, 1, 1, True), (256, 256, 3, 1, 1, True),
        (256, 512, 3, 1, 0, False), (512, 512, 1, 1, 0, False),
    ]

    class TSync(tnn.Module):
        def __init__(self):
            super().__init__()
            self.face_encoder = tnn.Sequential(
                *[TConv(*s) for s in face_specs])
            self.audio_encoder = tnn.Sequential(
                *[TConv(*s) for s in audio_specs])

        def forward(self, face, mel):
            f = self.face_encoder(face).flatten(1)
            a = self.audio_encoder(mel).flatten(1)
            return (torch.nn.functional.normalize(f, dim=1),
                    torch.nn.functional.normalize(a, dim=1))

    torch.manual_seed(81)
    ref = TSync().eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    from s2v_tpu.utils.weights import conversion_coverage

    variables, leftover = conversion_coverage(convert_syncnet, sd)
    assert leftover == []

    face = RNG.rand(2, 48, 96, 15).astype(np.float32)
    mel = RNG.rand(2, 80, 16, 1).astype(np.float32)
    with torch.no_grad():
        wf, wa = ref(
            torch.from_numpy(np.ascontiguousarray(face.transpose(0, 3, 1, 2))),
            torch.from_numpy(np.ascontiguousarray(mel.transpose(0, 3, 1, 2))),
        )
    gf, ga = SyncNet().apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(face), jnp.asarray(mel),
    )
    np.testing.assert_allclose(np.asarray(ga), wa.numpy(), rtol=0, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gf), wf.numpy(), rtol=0, atol=2e-3)


def test_conversion_coverage_guard():
    """conversion_coverage flags state-dict entries a converter ignores."""
    from s2v_tpu.utils.weights import SDView, conversion_coverage

    sd = {"a.weight": np.zeros((4, 3)), "a.bias": np.zeros(4),
          "stale.weight": np.ones(2),
          "bn.num_batches_tracked": np.zeros(())}

    def convert(d):
        v = SDView(d)
        return v.linear("a")

    _, leftover = conversion_coverage(convert, sd)
    assert leftover == ["stale.weight"]  # bookkeeping key ignored

    def convert_all(d):
        v = SDView(d)
        return {"a": v.linear("a"), "s": v.get("stale.weight")}

    _, leftover = conversion_coverage(convert_all, sd)
    assert leftover == []
