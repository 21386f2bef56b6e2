"""Persistent XLA compilation cache.

The workload dispatches a small, fixed family of bucketed shapes; with
a remote-compile TPU backend each fresh compile costs tens of seconds.
Persisting compiled executables across runs (and across the builder /
aligner / bench entry points) makes every run after the first start
hot. The reference has no analog — CUDA kernels are compiled at build
time; this is the JAX equivalent of shipping prebuilt cubins.
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    path = path or os.environ.get(
        "SOAP3DP_JAX_CACHE", os.path.expanduser("~/.cache/soap3dp-jax"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception as e:  # cache is an optimization, never fatal
        import sys
        print(f"[soap3dp] compilation cache disabled: {e}", file=sys.stderr)
