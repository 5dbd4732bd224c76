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

import os  # noqa: E402
import subprocess  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Build the native loader if missing so its tests run in the standard
# invocation instead of skipping (VERDICT r03 hygiene item).
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_REPO, "svo_tpu", "runtime", "libsvoloader.so")
if not os.path.exists(_SO):
    try:
        subprocess.run(
            ["make", "-C", os.path.join(_REPO, "native")],
            check=True, capture_output=True, timeout=120,
        )
    except Exception:
        pass  # tests fall back to their skipif guard


@pytest.fixture
def rng():
    return np.random.default_rng(42)
