"""TPU compile-smoke gate for the Pallas kernels.

Round-1 shipped a Mosaic-only lowering failure (Precision.HIGH inside
kernels) that the CPU interpret-mode test suite cannot see.  This gate
closes that hole: it lowers, compiles AND runs every Pallas kernel path
used by bench.py / the CLIs on the real chip (default platform), each
with forward + backward, and checks numerics against plain-jax oracles
on-device.

Usage (serialize TPU jobs — never run two at once):
    python scripts/tpu_smoke.py [--quick]

--quick skips the end-to-end slab train-step check (the individual
kernel compiles still cover every Mosaic program class).

Exit code 0 = every kernel compiles and matches its oracle.  Run this
BEFORE committing any change under gsn_tpu/ops/pallas/ (see CLAUDE.md).
"""

import os
import sys
import time
import traceback

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

RESULTS = []


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        RESULTS.append((name, True))
        print(f"[smoke] {name}: PASS ({time.time() - t0:.1f}s)", flush=True)
    except Exception:
        traceback.print_exc()
        RESULTS.append((name, False))
        print(f"[smoke] {name}: FAIL ({time.time() - t0:.1f}s)", flush=True)


def _random_disjoint_graphs(rng, n_graphs=12, lo=6, hi=40):
    recv, send = [], []
    off = 0
    for _ in range(n_graphs):
        g_n = int(rng.randint(lo, hi))
        for _ in range(g_n * 2):
            u, v = rng.randint(0, g_n, 2)
            if u != v:
                recv.append(off + u)
                send.append(off + v)
        off += g_n
    order = np.argsort(recv, kind="stable")
    return np.array(recv)[order], np.array(send)[order], off


def check_slab_message():
    import jax
    import jax.numpy as jnp
    from gsn_tpu.ops.pallas.slab_message import (build_slab_metadata,
                                                 slab_edge_message_aggregate)

    BN, BE, d = 128, 256, 64
    rng = np.random.RandomState(1)
    recv, send, N = _random_disjoint_graphs(rng)
    E_real = len(recv)
    E = -(-E_real // BE) * BE
    recv_p = np.concatenate([recv, np.zeros(E - E_real, np.int64)])
    send_p = np.concatenate([send, np.zeros(E - E_real, np.int64)])
    mask = np.arange(E) < E_real
    num_nodes = max(-(-N // BN), 4) * BN
    meta = build_slab_metadata(recv_p, send_p, mask, num_nodes, BN, BE)
    assert meta is not None
    A = rng.randn(N, d).astype(np.float32)
    B = rng.randn(N, d).astype(np.float32)
    b1 = rng.randn(d).astype(np.float32)
    Pe = rng.randn(len(meta["fb"]) * BE, d).astype(np.float32) * 0.1
    fb_wf = jnp.asarray(np.stack([meta["fb"], meta["wf"]]))
    g_out = rng.randn(num_nodes, d).astype(np.float32)

    def fused(A, B, Pe, b1):
        out = slab_edge_message_aggregate(
            A, B, Pe, b1, jnp.asarray(meta["recv_local"]),
            jnp.asarray(meta["send_local"]), fb_wf, N,
            num_nodes, BN, BE, "relu", True, False, None, "float32",
            True, meta["s_s"])
        return jnp.sum(out * g_out), out

    def ref(A, B, Pe, b1):
        H = jnp.maximum(A[recv] + B[send] + Pe[:E_real] + b1, 0.0)
        out = jax.ops.segment_sum(H, jnp.asarray(recv),
                                  num_segments=num_nodes)
        return jnp.sum(out * g_out), out

    args = tuple(map(jnp.asarray, (A, B, Pe, b1)))
    (_, out_f), gf = jax.value_and_grad(fused, argnums=(0, 1, 2, 3),
                                        has_aux=True)(*args)
    (_, out_r), gr = jax.value_and_grad(ref, argnums=(0, 1, 2, 3),
                                        has_aux=True)(*args)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=1e-3, atol=1e-3)
    for name, a, b in zip(["dA", "dB", "dPe", "db1"], gf, gr):
        a, b = np.asarray(a), np.asarray(b)
        if name == "dPe":
            a, b = a[:E_real], b[:E_real]
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3,
                                   err_msg=name)


def check_slab_weighted():
    """slab_weighted_gather (DGN directional aggregators): K per-edge
    weight columns in one kernel pass, fwd + bwd vs segment oracle."""
    import jax
    import jax.numpy as jnp
    from gsn_tpu.ops.pallas.slab_message import build_slab_metadata
    from gsn_tpu.ops.pallas.slab_weighted import slab_weighted_gather

    BN, BE, d, K = 128, 256, 70, 5
    rng = np.random.RandomState(11)
    recv, send, N = _random_disjoint_graphs(rng)
    E_real = len(recv)
    E = -(-E_real // BE) * BE
    recv_p = np.concatenate([recv, np.zeros(E - E_real, np.int64)])
    send_p = np.concatenate([send, np.zeros(E - E_real, np.int64)])
    mask = np.arange(E) < E_real
    num_nodes = max(-(-N // BN), 4) * BN
    meta = build_slab_metadata(recv_p, send_p, mask, num_nodes, BN, BE)
    assert meta is not None
    B = rng.randn(N, d).astype(np.float32)
    W = (rng.randn(E, K) * mask[:, None]).astype(np.float32)
    fb_wf = jnp.asarray(np.stack([meta["fb"], meta["wf"]]))
    g_out = rng.randn(num_nodes, K * d).astype(np.float32)

    def fused(B, W):
        out = slab_weighted_gather(
            B, W, jnp.asarray(meta["recv_local"]),
            jnp.asarray(meta["send_local"]), fb_wf, N, num_nodes,
            BN, BE, False, meta["s_s"])
        return jnp.sum(out * g_out), out

    def ref(B, W):
        h = B[send]
        out = jnp.concatenate(
            [jax.ops.segment_sum(W[:E_real, k:k + 1] * h,
                                 jnp.asarray(recv),
                                 num_segments=num_nodes)
             for k in range(K)], axis=1)
        return jnp.sum(out * g_out), out

    args = (jnp.asarray(B), jnp.asarray(W))
    (_, out_f), gf = jax.value_and_grad(fused, argnums=(0, 1),
                                        has_aux=True)(*args)
    (_, out_r), gr = jax.value_and_grad(ref, argnums=(0, 1),
                                        has_aux=True)(*args)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=2e-3, atol=2e-3)
    for name, a, b in zip(["dB", "dW"], gf, gr):
        a, b = np.asarray(a), np.asarray(b)
        if name == "dW":
            a, b = a[:E_real], b[:E_real]
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3,
                                   err_msg=name)


def check_slab_dgn_fused():
    """slab_dgn_fused: weighted sums + segment max/min in one launch,
    fwd + bwd vs segment oracle."""
    import jax
    import jax.numpy as jnp
    from gsn_tpu.ops.pallas.slab_message import build_slab_metadata
    from gsn_tpu.ops.pallas.slab_weighted import slab_dgn_fused

    BN, BE, d, K = 128, 256, 70, 5
    rng = np.random.RandomState(17)
    recv, send, N = _random_disjoint_graphs(rng)
    E_real = len(recv)
    E = -(-E_real // BE) * BE
    recv_p = np.concatenate([recv, np.zeros(E - E_real, np.int64)])
    send_p = np.concatenate([send, np.zeros(E - E_real, np.int64)])
    mask = np.arange(E) < E_real
    num_nodes = max(-(-N // BN), 4) * BN
    meta = build_slab_metadata(recv_p, send_p, mask, num_nodes, BN, BE)
    assert meta is not None
    B = rng.randn(N, d).astype(np.float32)
    W = (rng.randn(E, K) * mask[:, None]).astype(np.float32)
    fb_wf = jnp.asarray(np.stack([meta["fb"], meta["wf"]]))
    g_w = rng.randn(num_nodes, K * d).astype(np.float32)
    g_m = rng.randn(num_nodes, 2 * d).astype(np.float32)

    def fused(B, W):
        w_out, mm = slab_dgn_fused(
            B, W, jnp.asarray(meta["recv_local"]),
            jnp.asarray(meta["send_local"]), fb_wf, N, num_nodes,
            BN, BE, False, meta["s_s"])
        return jnp.sum(w_out * g_w) + jnp.sum(mm * g_m), (w_out, mm)

    def ref(B, W):
        h = B[send]
        w_out = jnp.concatenate(
            [jax.ops.segment_sum(W[:E_real, k:k + 1] * h,
                                 jnp.asarray(recv),
                                 num_segments=num_nodes)
             for k in range(K)], axis=1)
        mx = jax.ops.segment_max(h, jnp.asarray(recv),
                                 num_segments=num_nodes)
        mn = jax.ops.segment_max(-h, jnp.asarray(recv),
                                 num_segments=num_nodes)
        mm = jnp.concatenate(
            [jnp.where(jnp.isfinite(mx), mx, 0.0),
             jnp.where(jnp.isfinite(mn), mn, 0.0)], axis=1)
        return jnp.sum(w_out * g_w) + jnp.sum(mm * g_m), (w_out, mm)

    args = (jnp.asarray(B), jnp.asarray(W))
    (_, out_f), gf = jax.value_and_grad(fused, argnums=(0, 1),
                                        has_aux=True)(*args)
    (_, out_r), gr = jax.value_and_grad(ref, argnums=(0, 1),
                                        has_aux=True)(*args)
    for a, b in zip(out_f, out_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)
    for name, a, b in zip(["dB", "dW"], gf, gr):
        a, b = np.asarray(a), np.asarray(b)
        if name == "dW":
            a, b = a[:E_real], b[:E_real]
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3,
                                   err_msg=name)


def check_slab_minmax():
    """slab_segment_minmax (DGN max/min): segmented suffix tree-scan in
    VMEM, fwd + bwd vs segment_max oracle."""
    import jax
    import jax.numpy as jnp
    from gsn_tpu.ops.pallas.slab_message import build_slab_metadata
    from gsn_tpu.ops.pallas.slab_minmax import slab_segment_minmax

    BN, BE, d = 128, 256, 70
    rng = np.random.RandomState(13)
    recv, send, N = _random_disjoint_graphs(rng)
    E_real = len(recv)
    E = -(-E_real // BE) * BE
    recv_p = np.concatenate([recv, np.zeros(E - E_real, np.int64)])
    send_p = np.concatenate([send, np.zeros(E - E_real, np.int64)])
    mask = np.arange(E) < E_real
    num_nodes = max(-(-N // BN), 4) * BN
    meta = build_slab_metadata(recv_p, send_p, mask, num_nodes, BN, BE)
    assert meta is not None
    B = rng.randn(N, d).astype(np.float32)
    fb_wf = jnp.asarray(np.stack([meta["fb"], meta["wf"]]))
    g_out = rng.randn(num_nodes, 2 * d).astype(np.float32)

    def fused(B):
        out = slab_segment_minmax(
            B, jnp.asarray(meta["recv_local"]),
            jnp.asarray(meta["send_local"]), fb_wf, N, num_nodes,
            BN, BE, False, meta["s_s"])
        return jnp.sum(out * g_out), out

    def ref(B):
        h = B[send]
        mx = jax.ops.segment_max(h, jnp.asarray(recv),
                                 num_segments=num_nodes)
        mn = jax.ops.segment_max(-h, jnp.asarray(recv),
                                 num_segments=num_nodes)
        out = jnp.concatenate(
            [jnp.where(jnp.isfinite(mx), mx, 0.0),
             jnp.where(jnp.isfinite(mn), mn, 0.0)], axis=1)
        return jnp.sum(out * g_out), out

    (_, out_f), gf = jax.value_and_grad(fused, has_aux=True)(
        jnp.asarray(B))
    (_, out_r), gr = jax.value_and_grad(ref, has_aux=True)(
        jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def check_slab_pool():
    import jax
    import jax.numpy as jnp
    from gsn_tpu.ops.pallas.slab_pool import (build_pool_metadata,
                                              slab_add_pool)
    from gsn_tpu.ops.segment import global_add_pool

    rng = np.random.RandomState(3)
    sizes = rng.randint(4, 31, 250)
    batch = np.concatenate(
        [np.full(s, i, np.int32) for i, s in enumerate(sizes)])
    n = len(batch)
    node_cap = ((n + 63) // 64) * 64
    batch_p = np.zeros(node_cap, np.int32)
    batch_p[:n] = batch
    mask = np.arange(node_cap) < n
    graph_cap = 256
    meta = build_pool_metadata(batch_p, mask, graph_cap)
    assert meta is not None
    x = rng.randn(node_cap, 64).astype(np.float32)
    n_pad = meta["recv_local"].shape[0]
    xp = np.pad(x, ((0, n_pad - node_cap), (0, 0)))
    g_out = rng.randn(graph_cap, 64).astype(np.float32)

    def pooled(xp):
        out = slab_add_pool(xp, jnp.asarray(meta["recv_local"]),
                            jnp.asarray(meta["fb"]), graph_cap,
                            meta["block_g"], meta["block_e"], False)
        return jnp.sum(out * g_out), out

    def ref(xp):
        out = global_add_pool(xp[:node_cap], jnp.asarray(batch_p),
                              graph_cap, jnp.asarray(mask))
        return jnp.sum(out * g_out), out

    (_, out_f), gf = jax.value_and_grad(pooled, has_aux=True)(
        jnp.asarray(xp))
    (_, out_r), gr = jax.value_and_grad(ref, has_aux=True)(jnp.asarray(xp))
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf)[:node_cap],
                               np.asarray(gr)[:node_cap],
                               rtol=1e-4, atol=1e-4)


def check_slab_message_bf16():
    """data_dtype='bfloat16' (single-pass one-hot dots): must compile on
    Mosaic and stay bf16-close to the f32 oracle, fwd + bwd."""
    import jax
    import jax.numpy as jnp
    from gsn_tpu.ops.pallas.slab_message import (build_slab_metadata,
                                                 slab_edge_message_aggregate)

    BN, BE, d = 128, 256, 64
    rng = np.random.RandomState(7)
    recv, send, N = _random_disjoint_graphs(rng)
    E_real = len(recv)
    E = -(-E_real // BE) * BE
    recv_p = np.concatenate([recv, np.zeros(E - E_real, np.int64)])
    send_p = np.concatenate([send, np.zeros(E - E_real, np.int64)])
    mask = np.arange(E) < E_real
    num_nodes = max(-(-N // BN), 4) * BN
    meta = build_slab_metadata(recv_p, send_p, mask, num_nodes, BN, BE)
    assert meta is not None
    A = rng.randn(N, d).astype(np.float32)
    B = rng.randn(N, d).astype(np.float32)
    b1 = rng.randn(d).astype(np.float32)
    Pe = rng.randn(len(meta["fb"]) * BE, d).astype(np.float32) * 0.1
    fb_wf = jnp.asarray(np.stack([meta["fb"], meta["wf"]]))
    g_out = rng.randn(num_nodes, d).astype(np.float32)

    def fused(A, B, Pe, b1):
        out = slab_edge_message_aggregate(
            A, B, Pe, b1, jnp.asarray(meta["recv_local"]),
            jnp.asarray(meta["send_local"]), fb_wf, N,
            num_nodes, BN, BE, "relu", True, False, None, "bfloat16",
            True, meta["s_s"])
        return jnp.sum(out * g_out), out

    def ref(A, B, Pe, b1):
        Ab = A.astype(jnp.bfloat16).astype(jnp.float32)
        Bb = B.astype(jnp.bfloat16).astype(jnp.float32)
        Pb = Pe.astype(jnp.bfloat16).astype(jnp.float32)
        H = jnp.maximum(Ab[recv] + Bb[send] + Pb[:E_real] + b1, 0.0)
        out = jax.ops.segment_sum(
            H.astype(jnp.bfloat16).astype(jnp.float32),
            jnp.asarray(recv), num_segments=num_nodes)
        return jnp.sum(out * g_out), out

    args = tuple(map(jnp.asarray, (A, B, Pe, b1)))
    (_, out_f), gf = jax.value_and_grad(fused, argnums=(0, 1, 2, 3),
                                        has_aux=True)(*args)
    (_, out_r), gr = jax.value_and_grad(ref, argnums=(0, 1, 2, 3),
                                        has_aux=True)(*args)
    # bf16 rounding tolerance: values are O(1) sums of <=40 messages
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=0.05, atol=0.05)
    for name, a, b in zip(["dA", "dB", "dPe", "db1"], gf, gr):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        if name == "dPe":
            a, b = a[:E_real], b[:E_real]
        np.testing.assert_allclose(a, b, rtol=0.1, atol=0.1, err_msg=name)


def check_slab_message_no_a():
    """has_a=False (gin/ogb: A identically zero) — the A-side dots, DMAs
    and dA slab are skipped; must compile and match the oracle."""
    import jax
    import jax.numpy as jnp
    from gsn_tpu.ops.pallas.slab_message import (build_slab_metadata,
                                                 slab_edge_message_aggregate)

    BN, BE, d = 128, 256, 64
    rng = np.random.RandomState(9)
    recv, send, N = _random_disjoint_graphs(rng)
    E_real = len(recv)
    E = -(-E_real // BE) * BE
    recv_p = np.concatenate([recv, np.zeros(E - E_real, np.int64)])
    send_p = np.concatenate([send, np.zeros(E - E_real, np.int64)])
    mask = np.arange(E) < E_real
    num_nodes = max(-(-N // BN), 4) * BN
    meta = build_slab_metadata(recv_p, send_p, mask, num_nodes, BN, BE)
    assert meta is not None
    B = rng.randn(N, d).astype(np.float32)
    Pe = rng.randn(len(meta["fb"]) * BE, d).astype(np.float32) * 0.1
    zero = np.zeros((N, d), np.float32)
    b1 = np.zeros(d, np.float32)
    fb_wf = jnp.asarray(np.stack([meta["fb"], meta["wf"]]))
    g_out = rng.randn(num_nodes, d).astype(np.float32)

    def fused(B, Pe):
        out = slab_edge_message_aggregate(
            jnp.asarray(zero), B, Pe, jnp.asarray(b1),
            jnp.asarray(meta["recv_local"]),
            jnp.asarray(meta["send_local"]), fb_wf, N,
            num_nodes, BN, BE, "relu", True, False, None, "float32",
            False, meta["s_s"])
        return jnp.sum(out * g_out), out

    def ref(B, Pe):
        H = jnp.maximum(B[send] + Pe[:E_real], 0.0)
        out = jax.ops.segment_sum(H, jnp.asarray(recv),
                                  num_segments=num_nodes)
        return jnp.sum(out * g_out), out

    args = (jnp.asarray(B), jnp.asarray(Pe))
    (_, out_f), gf = jax.value_and_grad(fused, argnums=(0, 1),
                                        has_aux=True)(*args)
    (_, out_r), gr = jax.value_and_grad(ref, argnums=(0, 1),
                                        has_aux=True)(*args)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=1e-3, atol=1e-3)
    for name, a, b in zip(["dB", "dPe"], gf, gr):
        a, b = np.asarray(a), np.asarray(b)
        if name == "dPe":
            a, b = a[:E_real], b[:E_real]
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3,
                                   err_msg=name)


def check_graph_broadcast():
    """slab_graph_broadcast (vn -> nodes, transpose = slab pool): must
    compile on Mosaic and match the gather oracle fwd + bwd."""
    import jax
    import jax.numpy as jnp
    from gsn_tpu.ops.pallas.slab_pool import (build_pool_metadata,
                                              slab_graph_broadcast)

    rng = np.random.RandomState(5)
    sizes = rng.randint(4, 31, 200)
    batch = np.concatenate(
        [np.full(s, i, np.int32) for i, s in enumerate(sizes)])
    n = len(batch)
    node_cap = ((n + 63) // 64) * 64
    batch_p = np.zeros(node_cap, np.int32)
    batch_p[:n] = batch
    mask = np.arange(node_cap) < n
    graph_cap = 256
    meta = build_pool_metadata(batch_p, mask, graph_cap)
    assert meta is not None
    vn = rng.randn(graph_cap, 64).astype(np.float32)
    n_pad = meta["recv_local"].shape[0]
    g_out = rng.randn(n_pad, 64).astype(np.float32)

    def via_kernel(vn):
        out = slab_graph_broadcast(
            vn, jnp.asarray(meta["recv_local"]), jnp.asarray(meta["fb"]),
            graph_cap, meta["block_g"], meta["block_e"], False)
        return jnp.sum(out * g_out), out

    def via_gather(vn):
        out = jnp.where(jnp.asarray(mask)[:, None],
                        vn[jnp.asarray(batch_p)], 0.0)
        return jnp.sum(out * g_out[:node_cap]), out

    (_, out_k), gk = jax.value_and_grad(via_kernel, has_aux=True)(
        jnp.asarray(vn))
    (_, out_r), gr = jax.value_and_grad(via_gather, has_aux=True)(
        jnp.asarray(vn))
    np.testing.assert_allclose(np.asarray(out_k)[:node_cap],
                               np.asarray(out_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def check_slab_train_step(bn_mlp=False, compute_dtype=None):
    """End-to-end: one slab-path train step (the bench workload, small).

    ``bn_mlp=True`` additionally exercises the fused-BN slab path (the
    joint [H, H^2] moments pass with act='id_sq',
    nn/filters.py:134-164).  ``compute_dtype='bfloat16'`` exercises the
    single-pass bf16 kernel data mode end-to-end."""
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    import bench
    from gsn_tpu.config import GSNConfig
    from gsn_tpu.graphs.batching import iterate_batches, tight_epoch_caps
    from gsn_tpu.train.loop import Trainer, TrainerConfig

    graphs, d_id = bench.make_zinc_like(64)
    cfg = GSNConfig(
        model_name="GSN_edge_sparse", num_layers=2, d_out=64, d_h=64,
        out_features=1, msg_kind="general", id_scope="global",
        bn_mlp=bn_mlp, compute_dtype=compute_dtype,
        id_embedding="one_hot_encoder", input_node_encoder="embedding",
        edge_encoder="embedding", readout="sum",
        in_features=1, d_in_node_encoder=[28], d_in_edge_encoder=[4],
        d_in_id=d_id)
    tcfg = TrainerConfig(lr=1e-3, batch_size=64, scheduler="None",
                         loss_fn="L1Loss", prediction_fn="L1Loss",
                         shuffle=False)
    trainer = Trainer(cfg, tcfg, graphs)
    caps = tight_epoch_caps(np.arange(len(graphs)), graphs, 64)
    data = next(iterate_batches(
        graphs, 64, caps=caps, y_shape=(), y_dtype=np.float32,
        mxu_layout={"mode": "slab", "flow": "source_to_target",
                    "block_n": 128, "block_e": 256}))
    state = trainer.init_state(data, seed=0)
    state, loss = trainer._jit_train_step(state, data, 1e-3,
                                          jax.random.PRNGKey(0))
    jax.block_until_ready(loss)
    assert np.isfinite(float(loss)), f"non-finite loss {loss}"


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    print(f"[smoke] platform: {jax.devices()[0].platform}", flush=True)

    check("slab_message fwd+bwd", check_slab_message)
    check("slab_message bf16 fwd+bwd", check_slab_message_bf16)
    check("slab_message has_a=False fwd+bwd", check_slab_message_no_a)
    check("slab_weighted fwd+bwd", check_slab_weighted)
    check("slab_dgn_fused fwd+bwd", check_slab_dgn_fused)
    check("slab_minmax fwd+bwd", check_slab_minmax)
    check("slab_pool fwd+bwd", check_slab_pool)
    check("slab_graph_broadcast fwd+bwd", check_graph_broadcast)
    if "--quick" not in sys.argv:
        check("slab train step (end-to-end)", check_slab_train_step)
        check("slab train step (bn_mlp fused BN)",
              lambda: check_slab_train_step(bn_mlp=True))
        check("slab train step (bf16 compute)",
              lambda: check_slab_train_step(compute_dtype="bfloat16"))

    failed = [n for n, ok in RESULTS if not ok]
    print(f"[smoke] {len(RESULTS) - len(failed)}/{len(RESULTS)} passed",
          flush=True)
    if failed:
        print(f"[smoke] FAILED: {failed}", flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
