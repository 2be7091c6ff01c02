"""Persistent-compilation-cache plumbing (utils/jaxcache.py).

Run in subprocesses: jax.config compilation-cache updates are process-global
and must not leak into the other tests' JAX state.
"""

import os
import subprocess
import sys

SNIPPET = """
import sys
# force CPU at CONFIG level: the env sitecustomize's
# jax.config.update('jax_platforms', 'axon,cpu') OUTRANKS the
# JAX_PLATFORMS env var, so without this the subprocess touches the TPU
# relay — and hangs whenever another process (or a lingering claim)
# holds the single-tenant chip
import jax
jax.config.update('jax_platforms', 'cpu')
from mmlf_tpu.utils.jaxcache import enable_compilation_cache
path = enable_compilation_cache(sys.argv[1] if len(sys.argv) > 1 else None)
print('CACHE_AT', path)
import jax, jax.numpy as jnp
out = jax.jit(lambda x: (x * 2.0 + 1.0).sum())(jnp.arange(64.0))
print('RESULT', float(out))
"""


def _run(tmp_path, *args):
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    env.pop('MMLF_JAX_CACHE', None)
    # the suite conftest's cache env vars must not mask the module under test
    env.pop('JAX_COMPILATION_CACHE_DIR', None)
    return subprocess.run(
        [sys.executable, '-c', SNIPPET, *map(str, args)],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(__file__)), check=True)


def test_cache_populates_and_hits(tmp_path):
    cache = tmp_path / 'xc'
    r1 = _run(tmp_path, cache)
    assert f'CACHE_AT {cache}' in r1.stdout
    assert 'RESULT 4096.0' in r1.stdout
    entries = os.listdir(cache)
    assert entries, 'first run must write cache entries'

    # second process: same program, cache entries are reused, none added
    r2 = _run(tmp_path, cache)
    assert 'RESULT 4096.0' in r2.stdout
    assert sorted(os.listdir(cache)) == sorted(entries)


def test_cache_noop_without_path(tmp_path):
    r = _run(tmp_path)
    assert 'CACHE_AT None' in r.stdout
    assert 'RESULT 4096.0' in r.stdout


def test_cli_flags_exist():
    from mmlf_tpu.train.cli import main as train_main
    from mmlf_tpu.validate.cli import main as val_main
    for cli in (train_main, val_main):
        flags = {p.name for p in cli.params}
        assert 'jax_cache' in flags
