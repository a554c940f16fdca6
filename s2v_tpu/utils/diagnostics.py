"""Training observability (reference: third_part/emb/utils/diagnostic.py
Diagnostic — per-layer activation/grad statistics to CSV — and
arcface utils/utils_logging.py AverageMeter / utils_callbacks.py
CallBackLogging samples/sec).

TPU-native: statistics are computed inside the jitted step (one pass over
the param/grad pytrees), fetched with the metrics, and appended as JSON
lines — no hooks, no host sync per layer.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def tree_stats(tree: Any, prefix: str = "") -> Dict[str, jnp.ndarray]:
    """Per-leaf {mean, std, absmax} — jit-friendly (returns scalars)."""
    out: Dict[str, jnp.ndarray] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = prefix + "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        leaf = leaf.astype(jnp.float32)
        out[f"{name}.mean"] = leaf.mean()
        out[f"{name}.std"] = leaf.std()
        out[f"{name}.absmax"] = jnp.abs(leaf).max()
    return out


def global_norm(tree: Any) -> jnp.ndarray:
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
            for x in jax.tree_util.tree_leaves(tree))
    )


class AverageMeter:
    """arcface utils_logging.py AverageMeter."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class ThroughputLogger:
    """CallBackLogging equivalent: JSON-line stats with samples/sec."""

    def __init__(self, log_path: Optional[str] = None, every: int = 50):
        self.log_path = log_path
        self.every = every
        self._t0 = time.time()
        self._samples = 0
        self._last_step = 0
        self.loss = AverageMeter()

    def step(self, step: int, batch_size: int, metrics: Dict[str, float]):
        self._samples += batch_size
        if "loss" in metrics:
            self.loss.update(metrics["loss"])
        if step % self.every != 0 or step == self._last_step:
            return None
        dt = max(time.time() - self._t0, 1e-9)
        record = {
            "step": step,
            "samples_per_sec": round(self._samples / dt, 2),
            "loss_avg": round(self.loss.avg, 6),
            **{k: round(float(v), 6) for k, v in metrics.items()},
        }
        line = json.dumps(record)
        print(line, flush=True)
        if self.log_path:
            os.makedirs(os.path.dirname(self.log_path) or ".", exist_ok=True)
            with open(self.log_path, "a") as f:
                f.write(line + "\n")
        self._t0 = time.time()
        self._samples = 0
        self.loss.reset()
        self._last_step = step
        return record
