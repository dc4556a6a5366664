"""Regression tests for gsn_tpu.timing (ADVICE r2: host-cache hole).

jax.Array caches its host copy (``_npy_value``) after the first
device_get, so a barrier that fetches the *leaf itself* is only a real
fetch once — every later call returns the cache in ~µs, silently
zeroing the rtt subtraction for 0-d leaves (scalar losses).
device_sync must therefore always fetch a freshly derived scalar.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gsn_tpu.timing import device_sync, fetch_rtt


def test_device_sync_does_not_cache_0d_leaf():
    x = jnp.float32(3.0) * 2.0          # 0-d device array
    device_sync(x)
    device_sync(x)
    # the leaf itself must never have been fetched (no host cache)
    assert getattr(x, "_npy_value", None) is None


def test_device_sync_does_not_cache_nd_leaf():
    x = jnp.arange(8.0) + 1.0
    device_sync(x)
    assert getattr(x, "_npy_value", None) is None


def test_fetch_rtt_repeatable_on_0d():
    x = jnp.float32(1.5) + 0.5
    r1 = fetch_rtt(x)
    r2 = fetch_rtt(x)
    # both must be real fetches (dispatch + transfer), not cache hits;
    # on CPU that's still >= a few hundred ns of dispatch work
    assert r1 > 0.0 and r2 > 0.0


def test_device_sync_returns_input_and_handles_numpy():
    tree = {"a": np.zeros(3), "b": jnp.ones((2, 2))}
    out = device_sync(tree)
    assert out is tree
    assert device_sync({}) == {}
