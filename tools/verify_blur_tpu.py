"""On-chip verify for the MXU banded-matmul gaussian_blur rewrite.

Drives the shipped s2v_tpu.pipeline.utils.gaussian_blur on the real TPU at
the shapes the enhancement stages use (512^2 mouth/face masks, ksize=101),
checks it against the depthwise-conv formulation it replaced, and times
both jitted. One JSON line on stdout.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from s2v_tpu.utils import jitcache  # noqa: E402  (persistent compile cache)

jitcache.enable_persistent_cache()

from s2v_tpu.pipeline.utils import _gaussian_kernel1d, gaussian_blur  # noqa


def conv_blur(x, ksize, sigma):
    c = x.shape[-1]
    k = _gaussian_kernel1d(ksize, sigma)
    pad = ksize // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    kv = jnp.asarray(k, x.dtype)[:, None, None, None]
    kh = jnp.asarray(k, x.dtype)[None, :, None, None]
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(kv, (1, 1, 1, c)), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return jax.lax.conv_general_dilated(
        x, jnp.tile(kh, (1, 1, 1, c)), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def time_fn(fn, x, iters=20):
    y = fn(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(x)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    dev = jax.devices()[0]
    rng = np.random.RandomState(0)
    # the gpen512_step5 shape: batch-16 512^2 single-channel mask, 101 taps
    x = jax.device_put(rng.rand(16, 512, 512, 1).astype(np.float32), dev)
    new = jax.jit(lambda a: gaussian_blur(a, 101, 11.0))
    old = jax.jit(lambda a: conv_blur(a, 101, 11.0))
    y_new = np.asarray(new(x))
    y_old = np.asarray(old(x))
    err = float(np.abs(y_new - y_old).max())
    ms_new = time_fn(new, x)
    ms_old = time_fn(old, x)
    print(json.dumps({
        "device": str(dev), "shape": [16, 512, 512, 1], "ksize": 101,
        "max_abs_err_vs_conv": err,
        "ms_new_matmul": round(ms_new, 3), "ms_old_conv": round(ms_old, 3),
        "speedup": round(ms_old / ms_new, 2),
        "finite": bool(np.isfinite(y_new).all()),
    }))
    # On TPU the conv baseline itself runs bf16 passes by default, so the
    # two paths differ at ~1e-3 here; exact f32 parity is gated on CPU in
    # tests/test_pipeline_utils.py (1e-5).
    assert err < 5e-3 and np.isfinite(y_new).all()


if __name__ == "__main__":
    main()
