"""Temporal halo exchange for frame-axis sharding.

The pipeline has two temporal stencils that cross shard boundaries when the
frame axis is sharded over devices:

- the 27-frame 3DMM coefficient window fed to DNet's MappingNet
  (futils/inference_utils.py:73-91, ±13 frames, edge-clamped), and
- the 5-frame face-box smoothing (futils/inference_utils.py:101-108).

``halo_exchange`` runs inside shard_map over the data axis: each device
ppermutes its boundary rows to its neighbors, so windows near shard edges see
their true neighbors instead of clamped copies. The global sequence edges are
edge-clamped exactly like the reference's ``obtain_seq_index`` (which clips
indices to [0, N-1]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from s2v_tpu.parallel.mesh import DATA_AXIS


def _halo_exchange_local(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Inside shard_map: [n_local, ...] -> [n_local + 2*halo, ...].

    Edge shards fill their outer halo by clamping to their own first/last row
    (matching the reference's index clipping at sequence boundaries).
    """
    n_dev = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    right_perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    left_perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    # send my last `halo` rows to the right neighbor -> its left halo
    from_left = jax.lax.ppermute(x[-halo:], axis_name, right_perm)
    # send my first `halo` rows to the left neighbor -> its right halo
    from_right = jax.lax.ppermute(x[:halo], axis_name, left_perm)

    first = jnp.broadcast_to(x[:1], (halo,) + x.shape[1:])
    last = jnp.broadcast_to(x[-1:], (halo,) + x.shape[1:])
    left = jnp.where(idx == 0, first, from_left)
    right = jnp.where(idx == n_dev - 1, last, from_right)
    return jnp.concatenate([left, x, right], axis=0)


def windowed_map(fn, x, window: int, mesh: Mesh, extra_specs=()):
    """Apply ``fn(block)`` where block[i] sees a centered, edge-clamped
    ``window`` of the frame axis, with the frame axis sharded over devices.

    x: [N, ...] with N divisible by the data-axis size.
    fn: maps [n_local + window - 1, ...] -> [n_local, ...out] given the
        halo'd block (fn is responsible for window extraction).
    """
    assert window % 2 == 1
    halo = window // 2

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(DATA_AXIS),),
        out_specs=P(DATA_AXIS),
    )
    def run(xs):
        xs = _halo_exchange_local(xs, halo, DATA_AXIS)
        return fn(xs)

    return run(x)


def window_offsets(window: int) -> np.ndarray:
    """Frame offsets for a temporal window, reference convention.

    obtain_seq_index (inference_utils.py:73-76) is ``range(i-13, i+13)`` —
    a 26-wide window spanning offsets -13..+12. Generally: offsets
    ``arange(window) - window//2`` (asymmetric for even windows).
    """
    return np.arange(window) - window // 2


def gather_windows(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """[N, ...] -> [N, window, ...] windows, edges clamped.

    Single-device equivalent of the reference's obtain_seq_index
    (inference_utils.py:73-76: indices clipped to the valid range).
    """
    n = x.shape[0]
    idx = np.clip(np.arange(n)[:, None] + window_offsets(window)[None, :], 0, n - 1)
    return x[idx]


def sharded_coeff_windows(coeffs, window: int, mesh: Mesh):
    """[N, C] frame-sharded 3DMM coeffs -> [N, window, C] windows (sharded).

    The ±13-frame window usually exceeds the per-device frame count, so a
    neighbor halo exchange can't source it. The coefficient stream is tiny
    (N x 73 floats), so the idiomatic move is an all_gather over the data
    axis followed by a local static gather — the windows themselves stay
    sharded. (For large tensors with small stencils, use ``windowed_map``.)
    """

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(DATA_AXIS, None),),
        out_specs=P(DATA_AXIS, None, None),
    )
    def run(xs):
        n_local = xs.shape[0]
        full = jax.lax.all_gather(xs, DATA_AXIS, tiled=True)  # [N, C]
        n = full.shape[0]
        start = jax.lax.axis_index(DATA_AXIS) * n_local
        offsets = jnp.asarray(window_offsets(window))
        rows = start + jnp.arange(n_local)
        idx = jnp.clip(rows[:, None] + offsets[None, :], 0, n - 1)
        return full[idx]  # [n_local, window, C]

    return run(coeffs)


def smooth_boxes(boxes: jnp.ndarray, window: int = 5,
                 truncate: bool = False) -> jnp.ndarray:
    """Temporal box smoothing (inference_utils.py:101-108).

    Reference semantics: forward-looking T-frame mean, recentered to the
    last T boxes near the tail, applied IN PLACE on an int array — so tail
    windows read already-smoothed earlier rows, and with ``truncate`` each
    assignment truncates toward zero (int-array assignment).
    """
    n = boxes.shape[0]
    cur = boxes
    for i in range(n):
        if i + window > n:
            win = cur[n - window:]
        else:
            win = cur[i : i + window]
        val = win.mean(axis=0)
        if truncate:
            val = jnp.trunc(val)
        cur = cur.at[i].set(val)
    return cur
