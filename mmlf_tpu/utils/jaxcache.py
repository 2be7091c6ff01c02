"""Persistent XLA compilation cache (TPU-native extension).

The reference has no compile story at all (eager torch). Here every train /
validate invocation jit-compiles its programs, and on the TPU relay a cold
full-model compile costs 2-6 minutes of wall clock (docs/RELAY.md). JAX can
persist serialized executables keyed by a hash of (HLO, compile options,
backend version); enabling it turns every re-run, CI job, and serving
restart into a cache hit.

Opt-in via ``--jax_cache DIR`` on the train/validate CLIs or the
``MMLF_JAX_CACHE`` environment variable (flag wins). The cache directory is
shared freely between processes and machines with the same jaxlib/backend —
entries that don't match are simply misses.
"""

from __future__ import annotations

import os

ENV_VAR = 'MMLF_JAX_CACHE'


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path``.

    ``path=None``/'' falls back to ``$MMLF_JAX_CACHE``; if that is unset
    too, this is a no-op returning None. Must be called before the first
    compilation to catch everything (later calls still cache subsequent
    programs).
    """
    path = path or os.environ.get(ENV_VAR)
    if not path:
        return None
    path = os.path.abspath(os.path.expanduser(path))
    os.makedirs(path, exist_ok=True)

    import jax

    jax.config.update('jax_compilation_cache_dir', path)
    # cache every program: the default 1 s / 2 min thresholds would skip
    # exactly the small per-scene metric programs that dominate a cold
    # validate run's compile count
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    return path
