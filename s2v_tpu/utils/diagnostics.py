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


class Diagnostic:
    """Per-axis activation/param/grad statistics -> CSV (reference:
    third_part/emb/utils/diagnostic.py:19-125).

    The torch version registers forward/grad hooks; the JAX-idiomatic
    equivalent feeds pytrees in explicitly — params/grads from the train
    step, activations via ``capture_activations`` (flax
    capture_intermediates, the functional analogue of forward hooks).
    Accumulates abs/pos/val/rms/min/max/count per axis plus PCA singular
    values for small trailing dims.
    """

    def __init__(self, tag: str = "module", max_pca_dim: int = 512):
        self.tag = tag
        self.max_pca_dim = max_pca_dim
        self._history: Dict[str, Dict[str, Any]] = {}

    def _accumulate_along_axis(self, name: str, x, axis: int):
        import numpy as np

        x = np.moveaxis(np.asarray(x, np.float64), axis, -1)
        x = x.reshape(-1, x.shape[-1]) if x.ndim > 1 else x[None]
        size = x.shape[-1]
        h = self._history.setdefault(
            name, {"abs": 0.0, "pos": 0.0, "val": 0.0, "rms": 0.0, "cnt": 0,
                   "min": np.full(size, np.inf),
                   "max": np.full(size, -np.inf),
                   "pca": 0.0, "size": size})
        if h["size"] != size:
            return
        if size < self.max_pca_dim and len(x) > 1:
            centered = x - x.mean(0)
            q = min(6, size, len(x))  # torch.pca_lowrank default q=6
            h["pca"] = h["pca"] + np.linalg.svd(centered, compute_uv=False)[:q]
        h["abs"] = h["abs"] + np.abs(x).sum(0)
        h["pos"] = h["pos"] + np.clip(x, 0, None).sum(0)
        h["val"] = h["val"] + x.sum(0)
        h["rms"] = h["rms"] + np.square(x).sum(0)
        h["cnt"] += len(x)
        h["min"] = np.minimum(h["min"], x.min(0))
        h["max"] = np.maximum(h["max"], x.max(0))

    def accumulate(self, name: str, x, per_axis: bool = True):
        import numpy as np

        x = np.asarray(x)
        if per_axis and x.ndim > 0:
            for axis in range(x.ndim):
                self._accumulate_along_axis(f"{name}/axis_{axis}", x, axis)
        else:
            self._accumulate_along_axis(name, x.reshape(1, -1), -1)

    def accumulate_tree(self, tree, kind: str = "param",
                        per_axis: bool = True):
        import jax

        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                            for p in path)
            self.accumulate(f"{name}/{kind}", leaf, per_axis=per_axis)

    def rows(self):
        import numpy as np

        out = []
        for name, h in sorted(self._history.items()):
            cnt = max(h["cnt"], 1)
            row = {"name": name, "size": h["size"], "count": h["cnt"]}
            for stat in ("abs", "pos", "val", "rms"):
                v = np.asarray(h[stat], np.float64) / cnt
                if stat == "rms":
                    v = np.sqrt(v)
                row[stat] = float(np.mean(v))
            row["min"] = float(np.min(h["min"]))
            row["max"] = float(np.max(h["max"]))
            pca = np.asarray(h["pca"], np.float64).reshape(-1)
            row["pca"] = float(np.mean(pca)) if pca.size else 0.0
            out.append(row)
        return out

    def to_csv(self, path: str):
        import csv
        import os

        rows = self.rows()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w", newline="") as f:
            if rows:
                w = csv.DictWriter(f, fieldnames=list(rows[0]))
                w.writeheader()
                w.writerows(rows)
        return path

    def clear(self):
        self._history.clear()


def capture_activations(module, variables, *args, **kwargs):
    """Forward-hook analogue: run a flax module capturing every submodule
    output. Returns (outputs, intermediates pytree of activations)."""
    out, state = module.apply(
        variables, *args, capture_intermediates=True, mutable=["intermediates"],
        **kwargs)
    return out, state["intermediates"]
