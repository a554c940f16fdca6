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

    def _path(self, base_name: str, stage: str, params: Optional[dict]) -> str:
        tag = ""
        if params:
            blob = json.dumps(params, sort_keys=True, default=str).encode()
            tag = "_" + hashlib.sha1(blob).hexdigest()[:8]
        return os.path.join(self.directory, f"{base_name}_{stage}{tag}.npz")

    def get_or_compute(self, base_name: str, stage: str,
                       fn: Callable[[], Any], params: Optional[dict] = None,
                       refresh: bool = False):
        """Arrays (or dicts of arrays) returned by fn are cached as .npz."""
        path = self._path(base_name, stage, params)
        if self.enabled and not refresh and os.path.isfile(path):
            data = np.load(path, allow_pickle=False)
            keys = sorted(data.files)
            if keys == ["__single__"]:
                return data["__single__"]
            return {k: data[k] for k in keys}
        out = fn()
        if self.enabled:
            os.makedirs(self.directory, exist_ok=True)
            # uncompressed: frame stacks compress poorly and the reference's
            # .npy caches are raw too (facing.py:130,195)
            if isinstance(out, dict):
                np.savez(path, **{k: np.asarray(v) for k, v in out.items()})
            else:
                np.savez(path, __single__=np.asarray(out))
        return out

    def invalidate(self, base_name: str, stage: Optional[str] = None):
        prefix = f"{base_name}_{stage or ''}"
        if not os.path.isdir(self.directory):
            return
        for f in os.listdir(self.directory):
            if f.startswith(prefix) and f.endswith(".npz"):
                os.remove(os.path.join(self.directory, f))
