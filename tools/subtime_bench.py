"""Attribution micro-bench: where do the hot stage programs spend device time?

The round-3 devtime run showed the per-frame device cost concentrated in
programs that are mostly warps + parsing (gpen512_step5 at 31.6 ms/frame
runs NO generator — face_enhance=False), so this tool times the sub-ops in
isolation with the same carry-chained loop as bench.bench_devtime:

  * each model forward alone (RetinaFace-256/384, ParseNet-512, GFPGAN-512,
    GPEN-512 generator, RRDBNet x2)
  * each warp/resize primitive at the shapes the stage programs use
  * candidate reimplementations of the bilinear sample (flat gather vs
    two-stage row/col gather vs separable two-matmul) to pick the TPU-fast
    formulation before rewriting ops/warp.py

Usage: python tools/subtime_bench.py [n_iter] — prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from s2v_tpu.utils.jitcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def _sync(v):
    return np.asarray(jax.device_get(jnp.sum(jnp.asarray(v).astype(jnp.float32))))


def timeit(name, fn, args, n_iter, results, per=16):
    carry = jnp.zeros((), jnp.float32)
    try:
        g = jax.jit(fn).lower(carry, *args).compile()
    except Exception as e:  # noqa: BLE001
        results[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(f"# {name}: COMPILE FAIL", file=sys.stderr, flush=True)
        return
    carry = g(carry, *args)
    _sync(carry)
    t0 = time.time()
    for _ in range(n_iter):
        carry = g(carry, *args)
    _sync(carry)
    dt = (time.time() - t0) / n_iter
    results[name] = {
        "ms_per_batch": round(dt * 1000, 2),
        "ms_per_frame": round(dt * 1000 / per, 3),
    }
    print(f"# {name}: {results[name]}", file=sys.stderr, flush=True)


def main():
    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    B = 16
    rs = np.random.RandomState(5)
    f256 = jnp.asarray((rs.rand(B, 256, 256, 3) * 255).astype(np.float32))
    f384 = jnp.asarray((rs.rand(B, 384, 384, 3) * 255).astype(np.float32))
    f512 = jnp.asarray((rs.rand(B, 512, 512, 3) * 255).astype(np.float32))
    mats = jnp.asarray(
        np.tile(np.asarray([[0.9, 0.1, 10.0], [-0.1, 0.9, 5.0]], np.float32),
                (B, 1, 1)))
    boxes = jnp.asarray(
        np.tile(np.asarray([40, 30, 220, 210], np.float32), (B, 1)))

    from s2v_tpu.ops.warp import (affine_warp, crop_resize_boxes,
                                  grid_sample_bilinear)
    from s2v_tpu.ops.image import resize_bilinear
    from s2v_tpu.pipeline.utils import gaussian_blur
    from s2v_tpu.models.retinaface import RetinaFace
    from s2v_tpu.models.parsenet import ParseNet
    from s2v_tpu.models.gfpgan import GFPGANv1Clean
    from s2v_tpu.models.gpen import FullGenerator

    def fill(init_fn, *args):
        vs = jax.eval_shape(init_fn, jax.random.PRNGKey(0), *args)
        return jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype), vs)

    retina = RetinaFace()
    parse = ParseNet()
    gfp = GFPGANv1Clean()
    gpen = FullGenerator(size=512)
    v_ret = fill(retina.init, jnp.zeros((1, 256, 256, 3)))
    v_par = fill(parse.init, jnp.zeros((1, 512, 512, 3)))
    v_gfp = fill(gfp.init, jnp.zeros((1, 512, 512, 3)))
    v_gpen = fill(gpen.init, jnp.zeros((1, 512, 512, 3)))

    results = {}
    t = lambda name, fn, args: timeit(name, fn, args, n_iter, results)

    # --- model forwards alone -------------------------------------------
    t("retinaface_256",
      lambda c, v, x: jnp.sum(jax.tree_util.tree_leaves(
          retina.apply(v, x + c))[0].astype(jnp.float32)) * 1e-12 + c,
      (v_ret, f256))
    t("parsenet_512_f32",
      lambda c, v, x: jnp.sum(parse.apply(v, x * 1e-3 + c)[0]
                              .astype(jnp.float32)) * 1e-12 + c,
      (v_par, f512))
    t("parsenet_512_bf16",
      lambda c, v, x: jnp.sum(parse.apply(
          v, (x * 1e-3 + c).astype(jnp.bfloat16))[0]
          .astype(jnp.float32)) * 1e-12 + c,
      (v_par, f512))
    t("gfpgan_512_bf16",
      lambda c, v, x: jnp.sum(gfp.apply(
          v, (x * 1e-3 + c).astype(jnp.bfloat16), deterministic=True)[0]
          .astype(jnp.float32)) * 1e-12 + c,
      (v_gfp, f512))
    t("gpen512_gan_bf16",
      lambda c, v, x: jnp.sum(gpen.apply(
          v, (x * 1e-3 + c).astype(jnp.bfloat16), deterministic=True)
          .astype(jnp.float32)) * 1e-12 + c,
      (v_gpen, f512))

    # --- warp primitives at stage shapes --------------------------------
    t("affine_warp_256_to_512",
      lambda c, x, m: jnp.sum(affine_warp(x + c, m, (512, 512))) * 1e-12 + c,
      (f256, mats))
    t("affine_warp_512_to_256",
      lambda c, x, m: jnp.sum(affine_warp(x + c, m, (256, 256),
                                          inverse=True)) * 1e-12 + c,
      (f512, mats))
    t("crop_resize_256_to_384",
      lambda c, x, bx: jnp.sum(
          crop_resize_boxes(x + c, bx, (384, 384))) * 1e-12 + c,
      (f256, boxes))
    t("resize_256_to_512",
      lambda c, x: jnp.sum(resize_bilinear(x + c, (512, 512))) * 1e-12 + c,
      (f256,))
    t("gaussian_blur_9_384",
      lambda c, x: jnp.sum(gaussian_blur((x + c)[..., :1], 9, 1.0))
      * 1e-12 + c, (f384,))

    # --- candidate bilinear formulations --------------------------------
    # (a) the current flat gather, via an explicit affine grid
    # (b) two-stage: gather rows along y, then pixels along x
    # (c) separable two-matmul (valid for axis-aligned grids: crop/resize)
    def grid_from(mats, oh, ow, h, w):
        m = mats
        xs = jnp.arange(ow, dtype=jnp.float32)[None, None, :]
        ys = jnp.arange(oh, dtype=jnp.float32)[None, :, None]
        cc = lambda v: v[:, None, None]
        sx = cc(m[:, 0, 0]) * xs + cc(m[:, 0, 1]) * ys + cc(m[:, 0, 2])
        sy = cc(m[:, 1, 0]) * xs + cc(m[:, 1, 1]) * ys + cc(m[:, 1, 2])
        gx = (2.0 * sx + 1.0) / w - 1.0
        gy = (2.0 * sy + 1.0) / h - 1.0
        return jnp.stack([gx, gy], axis=-1)

    def crop_resize_two_stage(images, boxes, out_hw):
        """Axis-aligned only: y-gather whole rows (oh indices per frame),
        then x-gather pixels within rows."""
        n, h, w, ch = images.shape
        oh, ow = out_hw
        x1, y1, x2, y2 = (boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3])
        tx = (jnp.arange(ow, dtype=jnp.float32) + 0.5) / ow
        ty = (jnp.arange(oh, dtype=jnp.float32) + 0.5) / oh
        sx = x1[:, None] + tx[None, :] * (x2 - x1)[:, None] - 0.5  # [N,ow]
        sy = y1[:, None] + ty[None, :] * (y2 - y1)[:, None] - 0.5  # [N,oh]
        iy0 = jnp.floor(sy); ix0 = jnp.floor(sx)
        fy = (sy - iy0)[:, :, None, None]
        fx = (sx - ix0)[None, :, :, None]  # broadcast later per frame

        def rows_at(iy_):
            iyc = jnp.clip(iy_.astype(jnp.int32), 0, h - 1)  # [N, oh]
            return jnp.take_along_axis(
                images.reshape(n, h, w * ch), iyc[:, :, None],
                axis=1).reshape(n, oh, w, ch)

        def cols_at(rows, ix_):
            ixc = jnp.clip(ix_.astype(jnp.int32), 0, w - 1)  # [N, ow]
            r = rows.transpose(0, 2, 1, 3).reshape(n, w, oh * ch)
            out = jnp.take_along_axis(r, ixc[:, :, None], axis=1)
            return out.reshape(n, ow, oh, ch).transpose(0, 2, 1, 3)

        r0 = rows_at(iy0)
        r1 = rows_at(iy0 + 1.0)
        rr = r0 * (1.0 - fy) + r1 * fy  # [N, oh, W, C]
        v0 = cols_at(rr, ix0)
        v1 = cols_at(rr, ix0 + 1.0)
        fxb = jnp.broadcast_to(fx, v0.shape[:3] + (1,))
        return v0 * (1.0 - fxb) + v1 * fxb

    t("sample_flat_gather_512",
      lambda c, x, m: jnp.sum(grid_sample_bilinear(
          x + c, grid_from(m, 512, 512, 256, 256))) * 1e-12 + c,
      (f256, mats))

    def interp_matrix(src_pts, size):
        """[N, out] float sample positions -> [N, out, size] bilinear
        weights, built from a broadcasted iota compare (no gather).
        Out-of-range taps get zero weight (grid_sample zeros padding)."""
        i0 = jnp.floor(src_pts)
        f = src_pts - i0
        cols = jnp.arange(size, dtype=jnp.float32)[None, None, :]
        w0 = (cols == i0[..., None]).astype(jnp.float32) \
            * (1.0 - f)[..., None]
        w1 = (cols == (i0 + 1.0)[..., None]).astype(jnp.float32) \
            * f[..., None]
        return w0 + w1

    def crop_resize_matmul(images, boxes, out_hw):
        n, h, w, ch = images.shape
        oh, ow = out_hw
        x1, y1, x2, y2 = (boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3])
        tx = (jnp.arange(ow, dtype=jnp.float32) + 0.5) / ow
        ty = (jnp.arange(oh, dtype=jnp.float32) + 0.5) / oh
        sx = x1[:, None] + tx[None, :] * (x2 - x1)[:, None] - 0.5
        sy = y1[:, None] + ty[None, :] * (y2 - y1)[:, None] - 0.5
        ry = interp_matrix(sy, h)  # [N, oh, H]
        rx = interp_matrix(sx, w)  # [N, ow, W]
        tmp = jnp.einsum("nyh,nhwc->nywc", ry, images)
        return jnp.einsum("nxw,nywc->nyxc", rx, tmp)

    t("crop_resize_two_stage_256_to_384",
      lambda c, x, bx: jnp.sum(
          crop_resize_two_stage(x + c, bx, (384, 384))) * 1e-12 + c,
      (f256, boxes))
    t("crop_resize_matmul_256_to_384",
      lambda c, x, bx: jnp.sum(
          crop_resize_matmul(x + c, bx, (384, 384))) * 1e-12 + c,
      (f256, boxes))
    t("resize_matmul_256_to_512",
      lambda c, x: jnp.sum(crop_resize_matmul(
          x + c, jnp.tile(jnp.asarray([0.0, 0.0, 256.0, 256.0]), (B, 1)),
          (512, 512))) * 1e-12 + c,
      (f256,))

    print(json.dumps({"n_iter": n_iter,
                      "device": str(jax.devices()[0]),
                      "results": results}))


if __name__ == "__main__":
    main()
