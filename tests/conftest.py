"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require real TPU hardware: JAX runs on CPU with
xla_force_host_platform_device_count=8 so the multi-chip sharding paths are
exercised on a virtual mesh (this is the strategy SURVEY.md §4 prescribes as
the "fake backend").
"""
import os

# hard override: the environment presets JAX_PLATFORMS=axon (the real TPU
# tunnel); tests must run on the virtual CPU mesh
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = '/root/reference'


@pytest.fixture(scope='session')
def reference_assets():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip('reference assets not available')
    return REFERENCE_DIR


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(0)
