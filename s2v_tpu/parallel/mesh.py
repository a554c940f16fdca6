"""Device mesh and sharding rules.

The reference's distributed surface is NCCL through torch.distributed (DDP in
arcface_torch/train.py:58-59, GPEN/train_simple.py:384-398; primitive wrappers
in GPEN/distributed.py) plus DeepSpeed's launcher (third_part/emb). The
TPU-native replacement is one SPMD mesh:

- ``data`` axis: frames/samples (DDP and the pipeline's frame axis both map
  here — a video clip is data-parallel over time).
- ``model`` axis: sharded tensor dimensions (the PartialFC class axis, or
  channel sharding for very large generators).

Collectives are expressed through pjit shardings or shard_map + lax.psum /
all_gather / psum_scatter / ppermute over these axes; XLA places them on ICI.
Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
per-host data loading keys off ``jax.process_index()`` (the reference's
multiprocessing-pool video sharding, face3d/extract_kp_videos.py:85-109).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data_parallel: int = -1,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a 2-D (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel == -1:
        assert n % model_parallel == 0, (n, model_parallel)
        data_parallel = n // model_parallel
    assert data_parallel * model_parallel == n, (data_parallel, model_parallel, n)
    dev_array = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def frame_spec(ndim: int) -> P:
    """PartitionSpec sharding the leading (frame/batch) axis on ``data``."""
    return P(DATA_AXIS, *([None] * (ndim - 1)))


def shard_frames(x, mesh: Mesh):
    """Place an array with leading frame axis onto the mesh's data axis."""
    return jax.device_put(x, NamedSharding(mesh, frame_spec(x.ndim)))


def shard_frames_if_divisible(x, mesh: Mesh):
    """``shard_frames`` when the leading axis divides the data axis; the
    array untouched otherwise (small tail chunks run single-device rather
    than erroring — the pipeline's chunkers pad to the chunk size, so this
    only triggers when chunk < mesh data size)."""
    if x.shape[0] % mesh.shape[DATA_AXIS] == 0:
        return shard_frames(x, mesh)
    return x


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Pad the frame axis so it divides the data axis; returns (padded, n)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    mode = "edge" if hasattr(x, "dtype") else "constant"
    import jax.numpy as jnp

    return jnp.pad(x, pad, mode="edge"), n
