"""Per-video artifact cache (reference: temp/<basename>_*.{txt,npy} files,
facing.py:89-198, training.py:397-416 — load-bearing for iteration speed).

Each expensive pipeline stage's output is cached keyed by (video basename,
stage, parameters-hash) and skipped on re-run unless invalidated
(--re_preprocess equivalent: ``refresh=True``).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Callable, Optional

import numpy as np


class ArtifactCache:
    def __init__(self, directory: str = "temp", enabled: bool = True):
        self.directory = directory
        self.enabled = enabled
        # (path, value) pairs whose device->host copy + .npz write are
        # postponed to flush(); see get_or_compute(defer=True)
        self._pending: list = []

    def _path(self, base_name: str, stage: str, params: Optional[dict]) -> str:
        tag = ""
        if params:
            blob = json.dumps(params, sort_keys=True, default=str).encode()
            tag = "_" + hashlib.sha1(blob).hexdigest()[:8]
        return os.path.join(self.directory, f"{base_name}_{stage}{tag}.npz")

    def get_or_compute(self, base_name: str, stage: str,
                       fn: Callable[[], Any], params: Optional[dict] = None,
                       refresh: bool = False, defer: bool = False):
        """Arrays (or dicts of arrays) returned by fn are cached as .npz.

        ``defer=True`` keeps the cache write off the critical path: device
        arrays returned by fn get a non-blocking device->host copy kicked
        off immediately (``copy_to_host_async``) and the .npz write happens
        at ``flush()`` — by which point the copy has overlapped with the
        downstream stages. The caller receives fn's value unchanged (device
        arrays stay device arrays on a miss)."""
        path = self._path(base_name, stage, params)
        if self.enabled and not refresh and os.path.isfile(path):
            data = np.load(path, allow_pickle=False)
            keys = sorted(data.files)
            if keys == ["__single__"]:
                return data["__single__"]
            return {k: data[k] for k in keys}
        out = fn()
        if self.enabled:
            if defer:
                for v in (out.values() if isinstance(out, dict) else (out,)):
                    start = getattr(v, "copy_to_host_async", None)
                    if start is not None:
                        start()
                self._pending.append((path, out))
            else:
                self._write(path, out)
        return out

    def _write(self, path: str, out) -> None:
        os.makedirs(self.directory, exist_ok=True)
        # uncompressed: frame stacks compress poorly and the reference's
        # .npy caches are raw too (facing.py:130,195)
        if isinstance(out, dict):
            np.savez(path, **{k: np.asarray(v) for k, v in out.items()})
        else:
            np.savez(path, __single__=np.asarray(out))

    def flush(self) -> None:
        """Materialize every deferred write (the async copies started at
        get_or_compute time; np.asarray here just collects them)."""
        pending, self._pending = self._pending, []
        for path, out in pending:
            self._write(path, out)

    def invalidate(self, base_name: str, stage: Optional[str] = None):
        prefix = f"{base_name}_{stage or ''}"
        if not os.path.isdir(self.directory):
            return
        for f in os.listdir(self.directory):
            if f.startswith(prefix) and f.endswith(".npz"):
                os.remove(os.path.join(self.directory, f))
