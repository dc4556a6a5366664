"""Edge-partitioned graph parallelism: one (batched) graph too large for
a single chip is split across the mesh's ``ep`` axis.

The reference has no distributed execution at all (SURVEY §2.3); this is
the "graph/batch exceeding one chip" scaling layer the TPU build adds:

- nodes are block-partitioned: device d owns rows
  [d*N/D, (d+1)*N/D);
- edges are partitioned by *receiver* so the scatter-add of messages is
  entirely local (no communication on the reduction side);
- sender features are fetched with an all-gather of the node-feature
  shards over ICI, then gathered per edge.  With row width d_h after the
  node-level first dense (see ``EdgeMessageMLP``), the exchanged bytes
  are N*d_h*4 per layer.

Two exchange strategies:
- ``edge_partitioned_propagate``: all-gather the node shards, gather per
  edge (simple; peak memory = full node array);
- ``ring_edge_partitioned_propagate``: node shards rotate around the
  ring via ppermute, each hop aggregating the edges whose senders live
  in the currently-held shard — ICI transfers overlap with the local
  segment-sums and peak memory stays at ~2 shards (the halo-exchange
  overlap design from SURVEY §2.3 / BASELINE).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gsn_tpu.ops.segment import masked_segment_sum


def partition_edges_by_receiver(
    edge_index: np.ndarray,   # [2, E] global node ids (recv row 0)
    num_nodes: int,
    num_devices: int,
    edge_mask: np.ndarray | None = None,
) -> Dict[str, np.ndarray]:
    """Partition edges so device d holds every edge whose receiver lies
    in its node block, padded to a common per-device edge count.

    Returns arrays with a leading device axis:
    - ``recv_local`` [D, Ed]: receiver as a local row index,
    - ``send_global`` [D, Ed]: sender as a global node id,
    - ``edge_mask`` [D, Ed]: validity of each slot.
    """
    if num_nodes % num_devices:
        raise ValueError("num_nodes must be divisible by num_devices "
                         "(pad the node dimension to a multiple)")
    block = num_nodes // num_devices
    recv, send = edge_index[0], edge_index[1]
    if edge_mask is None:
        edge_mask = np.ones(edge_index.shape[1], dtype=bool)

    per_dev: List[Tuple[np.ndarray, np.ndarray]] = []
    for d in range(num_devices):
        sel = (recv // block == d) & edge_mask
        per_dev.append((recv[sel] - d * block, send[sel]))
    e_cap = max(len(r) for r, _ in per_dev)
    e_cap = max(((e_cap + 127) // 128) * 128, 128)

    D = num_devices
    recv_local = np.zeros((D, e_cap), np.int32)
    send_global = np.zeros((D, e_cap), np.int32)
    mask = np.zeros((D, e_cap), bool)
    for d, (r, s) in enumerate(per_dev):
        recv_local[d, : len(r)] = r
        send_global[d, : len(s)] = s
        mask[d, : len(r)] = True
    return {"recv_local": recv_local, "send_global": send_global,
            "edge_mask": mask, "node_block": block}


def edge_partitioned_propagate(
    mesh: Mesh,
    message_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    axis: str = "ep",
):
    """Build a jitted distributed propagate:

    ``out[v] = sum_{e: recv(e)=v} message_fn(x[recv(e)], x[send(e)])``

    with x sharded over node blocks and edges receiver-partitioned.
    ``message_fn`` maps ([Ed, d] x_i, [Ed, d] x_j) -> [Ed, dm].
    """

    def local(x_shard, recv_local, send_global, edge_mask):
        # drop the leading device axis shard_map leaves on edge arrays
        recv_local = recv_local[0]
        send_global = send_global[0]
        edge_mask = edge_mask[0]
        block = x_shard.shape[0]
        my = jax.lax.axis_index(axis)

        # fetch all node shards over ICI (bytes = N * d * 4)
        x_full = jax.lax.all_gather(x_shard, axis, tiled=True)

        x_i = x_shard[recv_local]
        x_j = x_full[send_global]
        msgs = message_fn(x_i, x_j)
        del my
        return masked_segment_sum(msgs, recv_local, block, edge_mask)

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis)))


def scaling_efficiency_bench(
    mesh: Mesh,
    num_nodes: int = 8192,
    avg_degree: int = 8,
    d: int = 128,
    iters: int = 20,
    seed: int = 0,
):
    """Edges/s of the distributed propagate vs the single-device run on
    the same graph (efficiency = dist_rate / (D * single_rate) would need
    D chips' worth of work; here we report both rates)."""
    import time

    rng = np.random.RandomState(seed)
    D = mesh.devices.size
    E = num_nodes * avg_degree
    edge_index = np.stack([rng.randint(0, num_nodes, E),
                           rng.randint(0, num_nodes, E)]).astype(np.int64)
    x = rng.randn(num_nodes, d).astype(np.float32)

    parts = partition_edges_by_receiver(edge_index, num_nodes, D)
    prop = edge_partitioned_propagate(
        mesh, lambda xi, xj: xi * 0.5 + xj)

    xs = jnp.asarray(x)
    args = (xs, jnp.asarray(parts["recv_local"]),
            jnp.asarray(parts["send_global"]),
            jnp.asarray(parts["edge_mask"]))
    out = prop(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = prop(*args)
    jax.block_until_ready(out)
    dist_dt = (time.perf_counter() - t0) / iters

    @jax.jit
    def single(x, recv, send):
        return masked_segment_sum(x[recv] * 0.5 + x[send], recv,
                                  num_nodes)

    r = jnp.asarray(edge_index[0])
    s = jnp.asarray(edge_index[1])
    out1 = single(xs, r, s)
    jax.block_until_ready(out1)
    t0 = time.perf_counter()
    for _ in range(iters):
        out1 = single(xs, r, s)
    jax.block_until_ready(out1)
    single_dt = (time.perf_counter() - t0) / iters

    return {"edges": E, "devices": D,
            "dist_edges_per_s": E / dist_dt,
            "single_edges_per_s": E / single_dt}


# ---------------------------------------------------------------------------
# ring-pipelined variant: rotate node shards with ppermute, aggregate
# per-hop partials — ICI transfers overlap with local segment-sums
# (XLA's latency-hiding scheduler interleaves the collective-permute
# with the per-hop compute)
# ---------------------------------------------------------------------------

def partition_edges_ring(
    edge_index: np.ndarray,    # [2, E] global ids, recv row 0
    num_nodes: int,
    num_devices: int,
) -> Dict[str, tuple]:
    """Bucket each device's received edges by the *source* shard, with a
    PER-HOP capacity: hop k on device d processes bucket
    ``(d, (d - k) % D)`` whose senders live in the shard d holds at that
    step; ``cap_k = max_d |bucket(d, (d-k)%D)|``.

    Per-hop (not uniform) capacities matter enormously for
    disjoint-union batches: each graph lives inside one shard, so the
    k=0 (local) bucket carries ~all edges and the remaining hops are
    near-empty — a uniform capacity (the r2 layout) padded every hop to
    the diagonal's size and inflated per-device work ~D-fold
    (SCALING_r02.json ring 0.091 vs allgather 0.195 @ D=8).

    Returns dict of LISTS (length D, one per hop) of [D, cap_k] arrays.
    """
    if num_nodes % num_devices:
        raise ValueError("num_nodes must be divisible by num_devices")
    block = num_nodes // num_devices
    recv, send = edge_index[0], edge_index[1]
    D = num_devices

    buckets = [[[] for _ in range(D)] for _ in range(D)]
    for e in range(edge_index.shape[1]):
        d = recv[e] // block
        s = send[e] // block
        buckets[d][s].append(e)

    recv_local, send_local, mask = [], [], []
    for k in range(D):
        cap = max((len(buckets[d][(d - k) % D]) for d in range(D)),
                  default=1)
        cap = max(((cap + 127) // 128) * 128, 128)
        rl = np.zeros((D, cap), np.int32)
        sl = np.zeros((D, cap), np.int32)
        m = np.zeros((D, cap), bool)
        for d in range(D):
            s = (d - k) % D
            idx = buckets[d][s]
            n = len(idx)
            rl[d, :n] = recv[idx] - d * block
            sl[d, :n] = send[idx] - s * block
            m[d, :n] = True
        recv_local.append(rl)
        send_local.append(sl)
        mask.append(m)
    return {"recv_local": tuple(recv_local),
            "send_local": tuple(send_local),
            "edge_mask": tuple(mask), "node_block": block}


def ring_edge_partitioned_propagate(
    mesh: Mesh,
    message_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    axis: str = "ep",
):
    """out[v] = sum_e message_fn(x[recv(e)], x[send(e)]) with node shards
    rotating around the ring: hop k processes the edges whose senders
    live in the shard currently held, then permutes the shard onward.
    Peak memory is 2 node shards (vs the full all-gather).  The hop loop
    is UNROLLED (D is static) so each hop keeps its own edge capacity
    and XLA's latency-hiding scheduler can slide each ppermute under the
    previous hop's segment-sum on hardware backends."""

    D = mesh.devices.size

    def local(x_shard, recvs, sends, masks):
        block = x_shard.shape[0]
        agg = None
        held = x_shard
        for k in range(D):
            r, s, m = recvs[k][0], sends[k][0], masks[k][0]
            msgs = message_fn(x_shard[r], held[s])
            part = masked_segment_sum(msgs, r, block, m)
            agg = part if agg is None else agg + part
            if k < D - 1:   # final hop needs no rotation
                held = jax.lax.ppermute(
                    held, axis, [(i, (i + 1) % D) for i in range(D)])
        return agg

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis)))
