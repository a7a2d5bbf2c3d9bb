"""Test configuration: force an 8-fake-device CPU backend.

The standard JAX trick (SURVEY.md §4.3): mesh/shard_map/ppermute logic is
tested hostless with ``--xla_force_host_platform_device_count=8``. The
environment pre-registers a remote 'axon' TPU backend at interpreter start
(sitecustomize), so jax is already imported here; overriding the
``jax_platforms`` config before first backend use routes everything to CPU.
Pallas kernels run under ``interpret=True`` in tests (SURVEY.md §4.4).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
