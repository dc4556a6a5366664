"""Slab-pool kernel: exact-match and gradient parity vs the XLA
segment-sum pooling, standalone and through the model path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsn_tpu.ops.pallas.slab_pool import build_pool_metadata, slab_add_pool
from gsn_tpu.ops.segment import global_add_pool, global_mean_pool


def _synthetic_batch(rng, num_graphs=300, min_n=4, max_n=30):
    sizes = rng.randint(min_n, max_n + 1, num_graphs)
    batch = np.concatenate(
        [np.full(s, i, np.int32) for i, s in enumerate(sizes)])
    n = len(batch)
    node_cap = ((n + 63) // 64) * 64
    batch_p = np.zeros(node_cap, np.int32)
    batch_p[:n] = batch
    mask = np.zeros(node_cap, bool)
    mask[:n] = True
    return batch_p, mask, n, node_cap, sizes


@pytest.mark.parametrize("graph_cap", [256, 512])
def test_slab_pool_matches_segment_sum(graph_cap):
    rng = np.random.RandomState(0)
    batch_p, mask, n, node_cap, sizes = _synthetic_batch(rng, 250)
    meta = build_pool_metadata(batch_p, mask, graph_cap)
    assert meta is not None
    x = rng.randn(node_cap, 64).astype(np.float32)
    n_pad = meta["recv_local"].shape[0]
    xp = jnp.asarray(np.pad(x, ((0, n_pad - node_cap), (0, 0))))
    out = slab_add_pool(xp, jnp.asarray(meta["recv_local"]),
                        jnp.asarray(meta["fb"]), graph_cap,
                        meta["block_g"], meta["block_e"], True)
    ref = global_add_pool(jnp.asarray(x), jnp.asarray(batch_p), graph_cap,
                          jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_slab_pool_gradient_matches():
    rng = np.random.RandomState(1)
    batch_p, mask, n, node_cap, sizes = _synthetic_batch(rng, 250)
    meta = build_pool_metadata(batch_p, mask, 256)
    x = rng.randn(node_cap, 32).astype(np.float32)
    n_pad = meta["recv_local"].shape[0]
    xp = jnp.asarray(np.pad(x, ((0, n_pad - node_cap), (0, 0))))

    def f_kernel(xp):
        return jnp.sum(jnp.tanh(slab_add_pool(
            xp, jnp.asarray(meta["recv_local"]), jnp.asarray(meta["fb"]),
            256, meta["block_g"], meta["block_e"], True)))

    def f_ref(x):
        return jnp.sum(jnp.tanh(global_add_pool(
            x, jnp.asarray(batch_p), 256, jnp.asarray(mask))))

    g_k = jax.grad(f_kernel)(xp)[:node_cap]
    g_r = jax.grad(f_ref)(jnp.asarray(x))
    # padding node rows get zero grad through the kernel (recv -1)
    np.testing.assert_allclose(np.asarray(g_k) * mask[:, None],
                               np.asarray(g_k), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_k)[mask], np.asarray(g_r)[mask],
                               rtol=1e-5, atol=1e-5)


def test_pool_seg_wrappers_match():
    rng = np.random.RandomState(2)
    batch_p, mask, n, node_cap, sizes = _synthetic_batch(rng, 250)
    meta = build_pool_metadata(batch_p, mask, 256)
    counts = np.bincount(batch_p[mask], minlength=256).astype(np.float32)
    seg = (jnp.asarray(meta["recv_local"]), jnp.asarray(meta["fb"]),
           meta["block_g"], jnp.asarray(counts))
    x = jnp.asarray(rng.randn(node_cap, 16).astype(np.float32))
    for fn in (global_add_pool, global_mean_pool):
        fast = fn(x, jnp.asarray(batch_p), 256, jnp.asarray(mask),
                  pool_seg=seg)
        slow = fn(x, jnp.asarray(batch_p), 256, jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                                   rtol=1e-5, atol=1e-5)


def test_model_output_unchanged_with_pool_metadata():
    """End-to-end: GNNSubstructures output must match with/without the
    slab-pool + slab-message batching metadata."""
    from gsn_tpu.config import GSNConfig
    from gsn_tpu.graphs.batching import iterate_batches
    from gsn_tpu.nn.models import build_model

    rng = np.random.RandomState(3)
    graphs = []
    for _ in range(300):
        nn_ = int(rng.randint(5, 14))
        edges = [(i, i + 1) for i in range(nn_ - 1)] + [(nn_ - 1, 0)]
        both = sorted(edges + [(v, u) for u, v in edges])
        ei = np.array(both, np.int64).T
        graphs.append({
            "x": rng.randint(0, 5, (nn_, 1)).astype(np.int64),
            "edge_index": ei,
            "degrees": np.bincount(ei[0], minlength=nn_).astype(np.float32),
            "identifiers": rng.randint(0, 3, (nn_, 2)).astype(np.int64),
            "y": np.float32(0.0),
        })
    cfg = GSNConfig(model_name="GSN_sparse", num_layers=2, d_out=64,
                    out_features=1, msg_kind="general", id_scope="global",
                    id_embedding="one_hot_encoder",
                    input_node_encoder="embedding", readout="sum",
                    in_features=1, d_in_node_encoder=[5],
                    d_in_id=[3, 3]).finalize()
    model = build_model(cfg)

    plain = next(iterate_batches(graphs, 300, shuffle=False, y_shape=(),
                                 y_dtype=np.float32))
    slab = next(iterate_batches(
        graphs, 300, shuffle=False, y_shape=(), y_dtype=np.float32,
        mxu_layout={"mode": "slab", "flow": "source_to_target",
                    "block_n": 128, "block_e": 256}))
    assert slab.pool_recv_local is not None
    rngs = {"params": jax.random.PRNGKey(0)}
    variables = model.init(rngs, plain, train=False)
    out_plain = model.apply(variables, plain, train=False)
    out_slab = model.apply(variables, slab, train=False)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_slab),
                               rtol=2e-4, atol=2e-4)


def test_slab_graph_broadcast_matches_gather():
    """slab_graph_broadcast == vn[batch] on real rows (0 on padding),
    and its transpose matches the segment-sum cotangent of the gather."""
    from gsn_tpu.ops.pallas.slab_pool import slab_graph_broadcast

    rng = np.random.RandomState(4)
    batch_p, mask, n, node_cap, sizes = _synthetic_batch(rng, 200)
    graph_cap = 256
    meta = build_pool_metadata(batch_p, mask, graph_cap)
    assert meta is not None
    vn = rng.randn(graph_cap, 48).astype(np.float32)
    n_pad = meta["recv_local"].shape[0]
    g_out = rng.randn(n_pad, 48).astype(np.float32)

    def via_kernel(vn):
        out = slab_graph_broadcast(
            vn, jnp.asarray(meta["recv_local"]), jnp.asarray(meta["fb"]),
            graph_cap, meta["block_g"], meta["block_e"], True)
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
                               np.asarray(out_r), rtol=1e-5, atol=1e-5)
    assert not np.asarray(out_k)[node_cap:].any()
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)
