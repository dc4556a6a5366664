"""Multi-process (multi-host) execution: the `jax.distributed` bootstrap
and per-process batch feeding.

The reference has no distributed execution at all (SURVEY §2.3); this is
the framework's scale-out layer.  One JAX *process* per host (or per
test worker) joins a cluster through the distributed coordinator; the
union of all processes' local devices forms one global `Mesh`, and the
same SPMD programs used single-process (`parallel/dp.py`,
`parallel/ep.py` shard_maps) run unchanged — collectives ride ICI within
a slice and DCN across hosts, inserted by XLA from the shardings.

What is genuinely multi-process here (the things a virtual single-process
mesh cannot exercise):
- the coordinator handshake (`jax.distributed.initialize`);
- per-process data feeding: each process materializes ONLY its own
  shard of the global batch (`make_process_dp_batch`), assembled into a
  global `jax.Array` via `jax.make_array_from_process_local_data`;
- host-side reductions of replicated outputs (`fetch_replicated`);
- rank-0-only side effects (checkpointing, logging) via
  `is_coordinator`.

Launch recipe (CPU test rig; N processes on one machine):

    # shell 1..N (process_id = 0..N-1):
    XLA_FLAGS=--xla_force_host_platform_device_count=2 \
    python -m gsn_tpu.cli ... \
        --coordinator_address 127.0.0.1:9955 \
        --num_procs_distributed N --process_id <i>

    # or programmatically:
    from gsn_tpu.parallel import distributed as dist
    dist.initialize("127.0.0.1:9955", N, i)   # before any device use
    mesh = dist.global_mesh("dp")
    batch = dist.make_process_dp_batch(graphs, mesh, ...)

On a real TPU pod each process is one host; `initialize()` with no
arguments lets the TPU runtime auto-discover the topology.

Tested end-to-end (2 and 4 spawned processes, gloo CPU collectives) by
tests/test_multiprocess.py: DP and EP train steps match the
single-process mesh bitwise-closely on identical data.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gsn_tpu.graphs.container import GraphBatch, batch_graphs


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               platform: Optional[str] = None) -> None:
    """`jax.distributed.initialize` with the right backend plumbing.

    Call BEFORE any other device use.  ``platform='cpu'`` forces the CPU
    backend and selects gloo cross-process collectives (the CPU backend
    otherwise has no inter-process collective implementation and every
    psum would silently hang).  On TPU the runtime's own collectives are
    used; with all arguments None the pod topology is auto-discovered.
    """
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if coordinator_address is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)


def is_coordinator() -> bool:
    """True on the process that should own side effects (checkpoint
    writes, log files): rank 0."""
    return jax.process_index() == 0


def global_mesh(axis: str = "dp") -> Mesh:
    """1-D mesh over every device in the cluster.  `jax.devices()` orders
    devices by process index, so each process's addressable devices form
    a contiguous range of the mesh axis — `make_process_dp_batch` relies
    on that to feed the right rows."""
    return Mesh(np.array(jax.devices()), (axis,))


def _local_rows(mesh: Mesh, axis: str) -> tuple:
    """(row_start, n_rows) of this process on the mesh axis."""
    devs = list(mesh.devices.ravel())
    pid = jax.process_index()
    mine = [i for i, d in enumerate(devs) if d.process_index == pid]
    if not mine:
        raise ValueError(f"process {pid} owns no devices of the mesh")
    if mine != list(range(mine[0], mine[0] + len(mine))):
        raise ValueError("process's devices are not contiguous on the "
                         "mesh axis; build the mesh with global_mesh()")
    return mine[0], len(mine)


def make_global_batch_from_local(local: GraphBatch, mesh: Mesh,
                                 axis: str = "dp",
                                 n_global_rows: Optional[int] = None
                                 ) -> GraphBatch:
    """Assemble a global device-axis-sharded GraphBatch from THIS
    process's rows.

    ``local`` leaves are [L, ...] host arrays (L = this process's device
    count on the axis); the result's leaves are global `jax.Array`s of
    shape [D, ...] sharded `P(axis)`, where other processes contribute
    their own rows.  Static (non-pytree) fields pass through unchanged —
    they are host metadata that every process computes identically."""
    if n_global_rows is None:
        n_global_rows = mesh.shape[axis]
    sharding = NamedSharding(mesh, P(axis))

    def mk(x):
        a = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sharding, a, global_shape=(n_global_rows,) + a.shape[1:])

    return jax.tree_util.tree_map(mk, local)


def make_process_dp_batch(graphs: List[Dict], mesh: Mesh,
                          node_cap: int, edge_cap: int, graph_cap: int,
                          axis: str = "dp", y_shape=(),
                          y_dtype=np.int64) -> GraphBatch:
    """Per-process data feeding for data parallelism.

    Deterministic global assignment (graph i -> mesh row i % D, exactly
    `parallel/dp.py make_global_batch`'s round-robin), but each process
    builds and holds ONLY the shards of its own devices — the host never
    materializes the other processes' data.  Every process must pass the
    same `graphs` *list structure* (same order/length); contents of
    other processes' graphs are never touched."""
    D = mesh.shape[axis]
    row0, L = _local_rows(mesh, axis)
    per_dev: List[List[Dict]] = [[] for _ in range(L)]
    for i, g in enumerate(graphs):
        d = i % D
        if row0 <= d < row0 + L:
            per_dev[d - row0].append(g)
    if not all(per_dev):
        raise ValueError(
            f"need >= {D} graphs per global batch, got {len(graphs)}")
    shards = [batch_graphs(chunk, node_cap, edge_cap, graph_cap,
                           y_shape=y_shape, y_dtype=y_dtype)
              for chunk in per_dev]
    local = jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *shards)
    return make_global_batch_from_local(local, mesh, axis, D)


def shard_stacked_batch(stacked: GraphBatch, mesh: Mesh,
                        axis: str = "ep") -> GraphBatch:
    """Turn a host-side [D, ...]-stacked batch (e.g. `make_ep_batch`'s
    output, which every process computes identically) into a global
    sharded batch by keeping only this process's rows.  Use when the
    partitioner needs the whole batch to compute shard metadata (edge
    partitioning); prefer `make_process_dp_batch` when shards are
    independent."""
    row0, L = _local_rows(mesh, axis)

    def mk(x):
        return np.asarray(x)[row0:row0 + L]

    local = jax.tree_util.tree_map(mk, stacked)
    return make_global_batch_from_local(local, mesh, axis,
                                        mesh.shape[axis])


def fetch_replicated(x):
    """Host value of a replicated (P()) output — reads this process's
    addressable shard, which equals every other's."""
    def get(a):
        if hasattr(a, "addressable_shards"):
            return np.asarray(a.addressable_shards[0].data)
        return np.asarray(a)

    return jax.tree_util.tree_map(get, x)
