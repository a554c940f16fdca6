"""Multi-host work sharding (reference: the torch.multiprocessing.Pool that
shards videos across GPUs via CUDA_VISIBLE_DEVICES,
face3d/extract_kp_videos.py:85-109, and emb's rank/env bootstrap,
emb/utils/distributed.py:7-93).

TPU-native: one process per host; `jax.distributed.initialize()` bootstraps
the cluster; work lists are sharded by `jax.process_index()`; leader-only
side effects use `is_leader`.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence, TypeVar

import jax

T = TypeVar("T")


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """jax.distributed bootstrap (the dist.init_process_group analogue,
    arcface train.py:23-30). No-op in single-process runs."""
    if num_processes is None:
        num_processes = int(os.environ.get("S2V_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator or os.environ["S2V_COORDINATOR"],
        num_processes=num_processes,
        process_id=process_id if process_id is not None
        else int(os.environ.get("S2V_PROCESS_ID", "0")),
    )


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_leader() -> bool:
    """emb utils/distributed.py leader decorators."""
    return jax.process_index() == 0


def shard_work(items: Sequence[T], index: Optional[int] = None,
               count: Optional[int] = None) -> List[T]:
    """This host's slice of a work list (round-robin, matching the
    reference's pool chunking behavior for balanced shards)."""
    index = jax.process_index() if index is None else index
    count = jax.process_count() if count is None else count
    return [it for i, it in enumerate(items) if i % count == index]


def leader_only(fn: Callable) -> Callable:
    """Run fn only on the leader (emb utils/distributed.py local_leader_only)."""
    def wrapped(*args, **kwargs):
        if is_leader():
            return fn(*args, **kwargs)
        return None

    return wrapped
