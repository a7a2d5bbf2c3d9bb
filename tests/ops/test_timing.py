"""Timing utility invariants (utils/timing.py)."""

import jax.numpy as jnp
import numpy as np

from stereo_tpu.utils.timing import _result_scalar, chained_seconds_per_call


def test_result_scalar_consumes_every_element():
    """The chained-timer scalar must be a FULL reduction of every leaf.

    Regression: a corner-element scalar let XLA dead-code-eliminate all
    but the first patch of banded pipelines inside the jitted chain
    (slice-of-concat), making patched-frame timings ~7x optimistic.
    """
    a = jnp.arange(6.0).reshape(2, 3)
    b = jnp.ones((2, 2), bool)
    s = float(_result_scalar((a, b)))
    assert s == float(a.sum()) + 4.0


def test_chained_timer_returns_positive_seconds():
    f = lambda x: (x * 2.0, x + 1.0)
    sec = chained_seconds_per_call(f, (jnp.ones((8, 8)),), iters=3, repeats=1)
    assert sec > 0
    assert np.isfinite(sec)
