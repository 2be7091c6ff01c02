"""Test configuration: force JAX onto CPU with 8 virtual devices.

This exercises the data-parallel mesh, collectives, and per-device batching
deterministically without TPU hardware (SURVEY.md §4).  The assignment is
unconditional: the ambient environment may point JAX at a tunneled TPU
platform, which would make every unit test pay remote-compile latency.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

# The environment's sitecustomize registers a remote-TPU backend and forces
# jax_platforms via jax.config.update(), which outranks the env var — counter
# it at config level before any backend initializes.
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# persistent compilation cache: repeated pytest runs skip recompiles
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache_tests')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES', '-1')

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        '--runslow', action='store_true', default=False,
        help='run slow full-configuration oracle tests (minutes each)')


def pytest_configure(config):
    config.addinivalue_line(
        'markers', 'slow: full-size (paper-configuration) parity tests, '
        'opt-in via --runslow or RUN_SLOW=1')


def pytest_collection_modifyitems(config, items):
    if config.getoption('--runslow') or os.environ.get('RUN_SLOW'):
        return
    skip = pytest.mark.skip(reason='slow: pass --runslow (or RUN_SLOW=1)')
    for item in items:
        if 'slow' in item.keywords:
            item.add_marker(skip)
