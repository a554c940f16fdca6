"""Quality metrics for parity evaluation (BASELINE.json: LSE-C/LSE-D and
PSNR parity with the reference).

- psnr/ssim: standard formulations (SSIM per Wang et al. with the 11x11
  gaussian window, matching skimage/basicsr conventions).
- SyncNet + lse_metrics: the Wav2Lip-style lip-sync scorer used to compute
  LSE-C/LSE-D in the VideoReTalking paper's evaluation protocol: a 5-frame
  mouth-window face encoder and a mel audio encoder scored by cosine
  similarity; LSE-D is the mean true-pair distance, LSE-C the mean
  confidence margin over a +-15-frame offset sweep. (Weights ship
  separately, like every checkpoint.)
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from s2v_tpu.models.layers import ConvBNReLU


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 255.0) -> jnp.ndarray:
    mse = jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


@functools.lru_cache(maxsize=None)
def _ssim_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    n = np.arange(size) - size // 2
    g = np.exp(-(n ** 2) / (2 * sigma ** 2))
    w = np.outer(g, g)
    return (w / w.sum()).astype(np.float32)


def ssim(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 255.0) -> jnp.ndarray:
    """a, b: [B, H, W, C]. Mean SSIM over the valid window positions."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    w = jnp.asarray(_ssim_window())[:, :, None, None]
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    c = a.shape[-1]
    wk = jnp.tile(w, (1, 1, 1, c))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, wk, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )

    mu_a = filt(a)
    mu_b = filt(b)
    mu_a2, mu_b2, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sa = filt(a * a) - mu_a2
    sb = filt(b * b) - mu_b2
    sab = filt(a * b) - mu_ab
    s = ((2 * mu_ab + c1) * (2 * sab + c2)) / (
        (mu_a2 + mu_b2 + c1) * (sa + sb + c2)
    )
    return s.mean()


class SyncNet(nn.Module):
    """Wav2Lip SyncNet: face [B, 48, 96, 15] (5 mouth frames stacked on
    channels), mel [B, 80, 16, 1] -> 512-d L2-normalized embeddings."""

    @nn.compact
    def __call__(self, face, mel) -> Tuple[jnp.ndarray, jnp.ndarray]:
        def enc(x, specs, prefix):
            for i, (f, k, s, p, res) in enumerate(specs):
                x = ConvBNReLU(f, (k, k), (s, s) if isinstance(s, int) else s,
                               (p, p), residual=res, name=f"{prefix}{i}")(x)
            return x.reshape(x.shape[0], -1)

        face_specs = [
            (32, 7, 1, 3, False),
            (64, 5, (1, 2), 1, False), (64, 3, 1, 1, True), (64, 3, 1, 1, True),
            (128, 3, 2, 1, False), (128, 3, 1, 1, True), (128, 3, 1, 1, True),
            (256, 3, 2, 1, False), (256, 3, 1, 1, True), (256, 3, 1, 1, True),
            (512, 3, 2, 1, False), (512, 3, 1, 1, True), (512, 3, 1, 1, True),
            (512, 3, 2, 1, False), (512, 3, 1, 0, False),
        ]
        audio_specs = [
            (32, 3, 1, 1, False), (32, 3, 1, 1, True), (32, 3, 1, 1, True),
            (64, 3, (3, 1), 1, False), (64, 3, 1, 1, True), (64, 3, 1, 1, True),
            (128, 3, 3, 1, False), (128, 3, 1, 1, True), (128, 3, 1, 1, True),
            (256, 3, (3, 2), 1, False), (256, 3, 1, 1, True), (256, 3, 1, 1, True),
            (512, 3, 1, 0, False), (512, 1, 1, 0, False),
        ]
        fe = enc(face, face_specs, "face")
        ae = enc(mel, audio_specs, "audio")
        fe = fe * jax.lax.rsqrt(jnp.sum(fe * fe, -1, keepdims=True) + 1e-12)
        ae = ae * jax.lax.rsqrt(jnp.sum(ae * ae, -1, keepdims=True) + 1e-12)
        return fe, ae


def lse_metrics(face_emb: np.ndarray, audio_emb: np.ndarray,
                vshift: int = 15) -> Tuple[float, float]:
    """LSE-D / LSE-C from per-frame embeddings [N, 512] (SyncNet_python
    protocol): for each frame, distances to audio embeddings across a
    +-vshift window; LSE-D = mean true-offset distance, LSE-C = mean
    (median-of-window - min) confidence."""
    n = min(len(face_emb), len(audio_emb))
    dists = []
    for i in range(n):
        lo = max(0, i - vshift)
        hi = min(n, i + vshift + 1)
        d = np.linalg.norm(face_emb[i : i + 1] - audio_emb[lo:hi], axis=1)
        dists.append((np.linalg.norm(face_emb[i] - audio_emb[i]), d))
    lse_d = float(np.mean([t for t, _ in dists]))
    lse_c = float(np.mean([np.median(d) - d.min() for _, d in dists]))
    return lse_d, lse_c
