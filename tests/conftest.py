"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
paths are testable without TPU hardware (SURVEY.md §4).

Notes specific to this environment:
- the axon sitecustomize registers a TPU PJRT plugin in every interpreter and
  JAX_PLATFORMS=cpu is overridden; jax.config.update('jax_platforms', ...)
  is what actually works;
- jax's backend must initialize BEFORE cv2 is imported anywhere, otherwise
  the cv2 OpenMP runtime deadlocks the XLA CPU client threadpool startup.
  Importing jax here (conftest imports run first) guarantees the order.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
_ = jax.devices()  # initialize the CPU client now, before any cv2 import

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
