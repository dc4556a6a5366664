"""Honest device timing through the axon remote-TPU tunnel.

``jax.block_until_ready`` is NOT a barrier on the axon platform
(measured 2026-08-20: it returned in <1 ms on a chained-matmul program
whose true device time was >130 ms, yielding a nonsense 38,000 "TFLOPS").
Only a device->host VALUE fetch retires the dispatch queue.  Every
timing loop in this repo must therefore end with :func:`device_sync`
and subtract :func:`fetch_rtt` (the latency of a bare scalar fetch,
~25 ms through the tunnel) once per timed region.

On regular backends (cpu tests, a local TPU) the fetch is equivalent to
``block_until_ready`` plus one cheap scalar transfer, so the helpers are
safe to use unconditionally.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def device_sync(x):
    """True barrier: force every dispatch feeding ``x`` to retire.

    Pulls one scalar element of the first array leaf to the host and
    returns ``x`` unchanged.
    """
    leaf = None
    for cand in jax.tree_util.tree_leaves(x):
        if hasattr(cand, "dtype"):
            leaf = cand
            break
    if leaf is None:
        return x
    # Always fetch a FRESH on-device scalar: jax.Array caches its host
    # copy (_npy_value) after the first fetch, so device_get on the leaf
    # itself is a ~µs cache hit the second time — which silently zeroed
    # the rtt subtraction for 0-d leaves (scalar losses).  Deriving a new
    # array (ravel()[0] / leaf + 0) dispatches a tiny program whose fetch
    # always crosses the tunnel.
    if getattr(leaf, "ndim", 0) == 0:
        scalar = leaf + jnp.zeros((), leaf.dtype) if hasattr(
            leaf, "block_until_ready") else leaf
    else:
        scalar = leaf.ravel()[0]
    np.asarray(jax.device_get(scalar))
    return x


def fetch_rtt(x) -> float:
    """Round-trip latency of a bare value fetch on already-ready ``x``.

    Call after :func:`device_sync` so the fetch measures transport, not
    compute; subtract the result from timed regions that end in
    :func:`device_sync`.
    """
    device_sync(x)
    t0 = time.perf_counter()
    device_sync(x)
    return time.perf_counter() - t0
