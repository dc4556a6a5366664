"""Multi-device scaling-efficiency bench (BASELINE: edges/s at 1 chip /
1 host / N hosts, >= 80% efficiency at 2+).

Runs the edge-partitioned propagate (all-gather and ring variants) on
every device-count 1..D of the available mesh and prints one JSON line
per configuration with edges/s and efficiency vs the 1-device rate.

On this environment only one real TPU chip is attached, so pass
``--device cpu --virtual 8`` to validate mechanics on a virtual CPU
mesh; on a real pod slice run it as-is.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual host devices (CPU only)")
    ap.add_argument("--num_nodes", type=int, default=8192)
    ap.add_argument("--avg_degree", type=int, default=8)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()
    import jax
    if args.device:
        jax.config.update("jax_platforms", args.device)

    import numpy as np
    from jax.sharding import Mesh

    from gsn_tpu.parallel.edge_partition import (
        partition_edges_by_receiver, partition_edges_ring,
        edge_partitioned_propagate, ring_edge_partitioned_propagate)

    devices = jax.devices()
    E = args.num_nodes * args.avg_degree
    rng = np.random.RandomState(0)
    edge_index = np.stack([
        rng.randint(0, args.num_nodes, E),
        rng.randint(0, args.num_nodes, E)]).astype(np.int64)
    x = rng.randn(args.num_nodes, args.d).astype(np.float32)

    import jax.numpy as jnp
    base_rate = {}
    for D in [d for d in (1, 2, 4, 8, 16) if d <= len(devices)]:
        mesh = Mesh(np.array(devices[:D]), ("ep",))
        for variant, part_fn, prop_fn in (
                ("allgather", partition_edges_by_receiver,
                 edge_partitioned_propagate),
                ("ring", partition_edges_ring,
                 ring_edge_partitioned_propagate)):
            if variant == "allgather":
                parts = part_fn(edge_index, args.num_nodes, D)
                arrs = (jnp.asarray(x), jnp.asarray(parts["recv_local"]),
                        jnp.asarray(parts["send_global"]),
                        jnp.asarray(parts["edge_mask"]))
            else:
                parts = part_fn(edge_index, args.num_nodes, D)
                arrs = (jnp.asarray(x), jnp.asarray(parts["recv_local"]),
                        jnp.asarray(parts["send_local"]),
                        jnp.asarray(parts["edge_mask"]))
            prop = prop_fn(mesh, lambda xi, xj: xi * 0.5 + xj)
            out = prop(*arrs)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = prop(*arrs)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.iters
            rate = E / dt
            key = variant
            if D == 1:
                base_rate[key] = rate
            eff = rate / (D * base_rate.get(key, rate))
            print(json.dumps({
                "variant": variant, "devices": D,
                "edges_per_s": round(rate, 1),
                "scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
