"""Persistent XLA compilation cache, enabled from one place.

The reference leans on a per-video artifact cache to make iteration cheap
(preprocessing/facing.py:89-97 caches stage *data*); this is the missing
half for a JAX framework: caching the compiled *programs*. Without it every
CLI/bench/test invocation re-pays the full XLA compile of the six-stage
pipeline (~15 min measured through this image's TPU relay: BENCH_r04
q1_e2e compile_run_s=933). With it, a verified probe on the relay showed a
repeat compile of a 209 s program drop to transfer-cost only.

Call :func:`enable_persistent_cache` before the first jit dispatch. It is
idempotent and safe to call from multiple entry points (cli, bench, tools,
tests, __graft_entry__). Controlled by env:

- ``S2V_JIT_CACHE``      cache directory (default ``/tmp/s2v_jax_cache``);
                         set to ``0``/``off`` to disable.
- ``S2V_JIT_CACHE_MIN_S`` min compile seconds to persist (default 1.0 —
                         the pipeline's programs all compile in >=2 s on
                         the relay; tiny test programs stay out).
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point jax at an on-disk compilation cache. Returns the directory in
    use, or None when disabled. Idempotent; later calls win only if jax has
    not compiled anything yet (jax re-reads the config per compile, so
    re-pointing is actually safe too — we just keep it simple)."""
    global _enabled
    env = os.environ.get("S2V_JIT_CACHE", "")
    if env.lower() in ("0", "off", "none", "disable", "disabled"):
        return None
    cache_dir = cache_dir or env or "/tmp/s2v_jax_cache"
    import jax

    if _enabled and jax.config.jax_compilation_cache_dir == cache_dir:
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(os.environ.get("S2V_JIT_CACHE_MIN_S", "1.0")))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return cache_dir
