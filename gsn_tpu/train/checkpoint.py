"""Checkpoint / resume (reference train_test_funcs.py:37-46,161-166).

Checkpoints hold {epoch, params, batch_stats, opt_state, scheduler
state}, serialized with flax's msgpack.  Mirrors the reference's
save-at-every-eval / resume-all-three semantics.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def _to_host_batched(tree):
    """Device->host fetch of a whole pytree in ONE transfer per dtype.

    Per-leaf device_get pays the remote-device tunnel's ~45 ms latency
    for every array; a params+opt_state tree has ~150 leaves, which made
    the per-epoch checkpoint save cost seconds.  Leaves are raveled and
    concatenated on device (one dispatch), fetched as one buffer, and
    re-split host-side."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves:
        return tree
    groups = {}
    for i, leaf in enumerate(leaves):
        groups.setdefault(jnp.asarray(leaf).dtype, []).append(i)
    host = [None] * len(leaves)
    for dt, idxs in groups.items():
        flat = jnp.concatenate(
            [jnp.ravel(jnp.asarray(leaves[i])) for i in idxs])
        buf = np.asarray(flat)
        off = 0
        for i in idxs:
            shape = jnp.shape(leaves[i])
            size = int(np.prod(shape)) if shape else 1
            host[i] = buf[off:off + size].reshape(shape)
            off += size
    return jax.tree_util.tree_unflatten(treedef, host)


def save_checkpoint(path: str, state, scheduler) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "epoch": int(state.epoch),
        "params": serialization.to_bytes(_to_host_batched(state.params)),
        "batch_stats": serialization.to_bytes(
            _to_host_batched(state.batch_stats)),
        "opt_state": serialization.to_bytes(
            _to_host_batched(state.opt_state)),
        "scheduler": scheduler.state_dict() if scheduler is not None else None,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str, state, scheduler=None):
    """Restore into a template state (shapes/dtypes must match).

    Returns (state, start_epoch)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    params = serialization.from_bytes(
        jax.device_get(state.params), payload["params"])
    batch_stats = serialization.from_bytes(
        jax.device_get(state.batch_stats), payload["batch_stats"])
    opt_state = serialization.from_bytes(
        jax.device_get(state.opt_state), payload["opt_state"])
    if scheduler is not None and payload["scheduler"] is not None:
        scheduler.load_state_dict(payload["scheduler"])
    new_state = dataclasses.replace(
        state, params=params, batch_stats=batch_stats,
        opt_state=opt_state, epoch=payload["epoch"] + 1)
    return new_state, payload["epoch"] + 1
