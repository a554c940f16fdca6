"""Benchmark: flagship generator throughput on the real TPU chip.

Measures the Step-6 hot path of the reference pipeline (inference.py:259-330):
per-frame mel window + 384^2 face crops -> ENet(LNet) -> 384^2 output. This
is where >90% of the reference's inference FLOPs live. Prints ONE JSON line:

  {"metric": ..., "value": fps, "unit": "frames/sec", "vs_baseline": fps/100}

Baseline: BASELINE.json north star = 100 fps at 384^2 on one v5e chip.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from s2v_tpu.models import ENet

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dtype = jnp.bfloat16

    model = ENet()
    rng = jax.random.PRNGKey(0)
    audio = jnp.zeros((batch, 80, 16, 1), dtype)
    face = jnp.zeros((batch, 384, 384, 6), dtype)
    gt = jnp.zeros((batch, 384, 384, 3), dtype)

    def sync(v):
        # On the axon relay backend block_until_ready returns early; a
        # device->host transfer is the only reliable sync point.
        return np.asarray(jax.device_get(jnp.sum(v.astype(jnp.float32))))

    t0 = time.time()
    variables = jax.jit(model.init)(rng, audio, face, gt)
    sync(jax.tree_util.tree_leaves(variables)[0])
    init_s = time.time() - t0

    @jax.jit
    def fwd(variables, audio, face, gt):
        pred, low = model.apply(variables, audio, face, gt)
        return pred

    t0 = time.time()
    out = fwd(variables, audio, face, gt)
    sync(out)
    compile_s = time.time() - t0

    # steady state: chain iterations through a data dependency (pred -> gt)
    # so the device must execute them sequentially, then sync once.
    n_iter = 20
    t0 = time.time()
    for _ in range(n_iter):
        out = fwd(variables, audio, face, out)
    sync(out)
    t_total = time.time() - t0
    t1 = time.time()
    sync(out)
    t_sync = time.time() - t1
    dt = max(t_total - t_sync, 1e-9) / n_iter
    fps = batch / dt

    print(
        json.dumps(
            {
                "metric": "enet_lnet_generator_fps_384px_bf16",
                "value": round(fps, 1),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 100.0, 3),
                "detail": {
                    "batch": batch,
                    "ms_per_batch": round(dt * 1000, 2),
                    "init_s": round(init_s, 1),
                    "compile_s": round(compile_s, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
