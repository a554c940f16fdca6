"""Isolated on-chip probe: direct vs space-to-depth 3x3 conv per hot shape.

The full-pipeline measurement (tools/out/r5_s2d_devtime.out) showed the
blanket S2V_S2D_CONV=1 default is a loss on every stage (mouth_tail 13.7 ->
20.0 ms/frame). This probe separates two hypotheses:

  (a) the packed conv ITSELF is slower than XLA's direct lowering on v5e
      (then the idea is dead), vs
  (b) the conv is faster standalone but the pack/unpack transposes around
      EACH conv break XLA's conv+bias+act fusions (then packing once per
      conv CHAIN — e.g. GFPGAN's condition_scale*_0 -> lrelu -> *_2 — could
      still win).

Times three variants per shape, each as one jitted program chained n_iter
times through a carry (same methodology as bench.py devtime):
  direct     x -> conv3x3+bias+lrelu -> conv3x3+bias
  s2d        same but each conv via _conv3x3_s2d (pack/unpack per conv)
  s2d_chain  pack once -> conv2x2+bias+lrelu -> conv2x2+bias -> unpack

Usage: python tools/s2d_conv_probe.py  (writes one JSON line per shape)
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from s2v_tpu.utils.jitcache import enable_persistent_cache

enable_persistent_cache()

import s2v_tpu.ops.convs as cv


def _pack(x):
    b, h, w, c = x.shape
    xp = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return xp.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def _unpack(y, co):
    b, h2, w2, _ = y.shape
    y = y.reshape(b, h2, w2, 2, 2, co)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h2, 2 * w2, co)


def _packed_kernel(w):
    c, co = w.shape[2], w.shape[3]
    m = jnp.asarray(cv._S2D_M, w.dtype)
    w2 = jnp.einsum("pqrsabuv,uvco->pqrscabo", m, w)
    return w2.reshape(2, 2, 4 * c, 4 * co)


def _conv_direct(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(y.dtype)


def _conv_packed(xp, w2, b):
    # xp already packed and zero-padded by 1 on each side BEFORE packing;
    # VALID 2x2 conv over the packed layout
    y = jax.lax.conv_general_dilated(
        xp, w2.astype(xp.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    co4 = w2.shape[3]
    return y + jnp.tile(b, 4).astype(y.dtype)[None, None, None, :co4]


def time_variant(fn, args, n_iter=24):
    f = jax.jit(fn)
    carry = jnp.zeros((), jnp.float32)
    out = f(carry, *args)
    np.asarray(out)  # force real completion through the relay (d2h fetch)
    t0 = time.time()
    c = jnp.zeros((), jnp.float32)
    for _ in range(n_iter):
        c = f(c, *args)
    v = float(np.asarray(c))
    dt = (time.time() - t0) / n_iter * 1000.0
    assert v == v  # NaN guard: the chain must have actually run
    return dt


def main():
    rng = np.random.default_rng(0)
    # (B, H, W, Cin, Cout, dtype) — the profiled hot shapes:
    # GFPGAN clean condition branch at 512 (unet ch 32), stylegan decoder 64,
    # RRDBNet 64-ch at 768 (the final_sr stage), DNet 256^2
    shapes = [
        (16, 512, 512, 32, 32, jnp.bfloat16),
        (16, 512, 512, 64, 64, jnp.bfloat16),
        (1, 768, 768, 64, 64, jnp.bfloat16),
        (16, 256, 256, 64, 64, jnp.bfloat16),
        (16, 512, 512, 32, 32, jnp.float32),
    ]
    for (B, H, W, C, Co, dt) in shapes:
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), dt)
        w1 = jnp.asarray(rng.standard_normal((3, 3, C, Co)) * 0.05, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((3, 3, Co, Co)) * 0.05, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal((Co,)) * 0.01, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal((Co,)) * 0.01, jnp.float32)

        def direct(c, x, w1, b1, w2, b2):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            h = jax.nn.leaky_relu(_conv_direct(xp + c.astype(x.dtype), w1, b1), 0.2)
            hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
            y = _conv_direct(hp, w2, b2)
            return jnp.sum(y.astype(jnp.float32)) * 1e-12 + c

        def s2d_per_conv(c, x, w1, b1, w2, b2):
            h = jax.nn.leaky_relu(
                cv._conv3x3_s2d(x + c.astype(x.dtype), w1.astype(x.dtype), 1, 1)
                + b1.astype(x.dtype), 0.2)
            y = cv._conv3x3_s2d(h, w2.astype(x.dtype), 1, 1) + b2.astype(x.dtype)
            return jnp.sum(y.astype(jnp.float32)) * 1e-12 + c

        def s2d_chain(c, x, w1, b1, w2, b2):
            k1, k2 = _packed_kernel(w1), _packed_kernel(w2)
            xpad = jnp.pad(x + c.astype(x.dtype),
                           ((0, 0), (1, 1), (1, 1), (0, 0)))
            xp = _pack(xpad)                       # [B,(H+2)/2,(W+2)/2,4C]
            h = jax.nn.leaky_relu(_conv_packed(xp, k1, b1), 0.2)
            # re-pad in packed space for the second conv: unpack-pad-pack is
            # what we're trying to avoid, so pad the packed tensor by one
            # BLOCK on each side (2 original pixels of zeros) -- NOT
            # numerically identical to 1-px zero padding at the seam ring;
            # good enough to bound the fusion cost, not a product path.
            hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
            y = _conv_packed(hp, k2, b2)
            return jnp.sum(y.astype(jnp.float32)) * 1e-12 + c

        row = {"shape": [B, H, W, C, Co], "dtype": str(dt.__name__)}
        for name, fn in [("direct", direct), ("s2d", s2d_per_conv),
                         ("s2d_chain", s2d_chain)]:
            try:
                row[name + "_ms"] = round(
                    time_variant(fn, (x, w1, b1, w2, b2)), 3)
            except Exception as e:  # OOM / compile failure is a verdict too
                row[name + "_ms"] = None
                row[name + "_error"] = repr(e)[:120]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
