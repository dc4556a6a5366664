"""Fused gather+MLP+scatter kernel vs a plain-jax oracle (interpret
mode on CPU), including gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsn_tpu.ops.pallas.fused_message import (build_window_sends,
                                              fused_edge_message_aggregate)
from gsn_tpu.ops.pallas.segment_mxu import build_block_aligned_layout

BN, BE = 128, 128


def setup(seed=0, n_graphs=10, d1=32, d2=16, with_pe=True):
    """Disjoint small graphs (each < BN nodes), recv-sorted edges."""
    rng = np.random.RandomState(seed)
    edges = []
    offset = 0
    for _ in range(n_graphs):
        g_n = rng.randint(5, 40)
        for _ in range(g_n * 2):
            u, v = rng.randint(0, g_n, 2)
            if u != v:
                edges.append((offset + u, offset + v))
        offset += g_n
    N = offset
    edges.sort()   # sort by receiver (row 0 = recv)
    recv = np.array([e[0] for e in edges])
    send = np.array([e[1] for e in edges])
    E = len(edges)

    num_nodes = max(-(-N // BN), 3) * BN
    layout = build_block_aligned_layout(recv, num_nodes, BN, BE)
    num_blocks = num_nodes // BN
    ws = build_window_sends(send, layout["perm"], layout["recv_local"],
                            layout["chunk_nb"], BN, num_blocks)
    assert ws is not None
    send_local, win_first = ws

    A = rng.randn(N, d1).astype(np.float32)
    B = rng.randn(N, d1).astype(np.float32)
    b1 = rng.randn(d1).astype(np.float32)
    W2 = rng.randn(d1, d2).astype(np.float32) / np.sqrt(d1)
    C = len(layout["chunk_nb"])
    Pe = (rng.randn(C * BE, d1).astype(np.float32) * 0.1
          if with_pe else None)
    cwf = np.stack([layout["chunk_nb"], layout["chunk_first"], win_first])
    return dict(N=N, E=E, recv=recv, send=send, layout=layout,
                send_local=send_local, cwf=cwf, A=A, B=B, b1=b1, W2=W2,
                Pe=Pe, num_nodes=num_nodes)


def oracle(s, act="relu"):
    H = s["A"][s["recv"]] + s["B"][s["send"]] + s["b1"]
    if s["Pe"] is not None:
        # Pe is in layout order; map back via perm over valid slots
        valid = s["layout"]["recv_local"] >= 0
        pe_orig = np.zeros((s["E"], s["A"].shape[1]), np.float32)
        pe_orig[s["layout"]["perm"][valid]] = s["Pe"][valid]
        H = H + pe_orig
    if act == "relu":
        H = np.maximum(H, 0.0)
    out = np.zeros((s["num_nodes"], s["A"].shape[1]), np.float32)
    np.add.at(out, s["recv"], H)
    return out


@pytest.mark.parametrize("with_pe", [True, False])
def test_fused_forward_matches_oracle(with_pe):
    s = setup(with_pe=with_pe)
    out = np.asarray(fused_edge_message_aggregate(
        jnp.asarray(s["A"]), jnp.asarray(s["B"]),
        jnp.asarray(s["Pe"]) if with_pe else jnp.zeros((1, 1)),
        jnp.asarray(s["b1"]),
        jnp.asarray(s["layout"]["recv_local"]),
        jnp.asarray(s["send_local"]), jnp.asarray(s["cwf"]),
        s["num_nodes"], BN, BE, "relu", with_pe, True))
    want = oracle(s)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_fused_gradients_match_oracle():
    s = setup(with_pe=True)
    g_out = np.random.RandomState(9).randn(
        s["num_nodes"], s["A"].shape[1]).astype(np.float32)

    def fused_loss(A, B, Pe, b1):
        out = fused_edge_message_aggregate(
            A, B, Pe, b1,
            jnp.asarray(s["layout"]["recv_local"]),
            jnp.asarray(s["send_local"]), jnp.asarray(s["cwf"]),
            s["num_nodes"], BN, BE, "relu", True, True)
        return jnp.sum(out * g_out)

    def ref_loss(A, B, Pe, b1):
        valid = s["layout"]["recv_local"] >= 0
        perm = s["layout"]["perm"]
        pe_orig = jnp.zeros((s["E"], A.shape[1]))
        pe_orig = pe_orig.at[perm[valid]].set(Pe[valid])
        H = A[s["recv"]] + B[s["send"]] + pe_orig + b1
        H = jnp.maximum(H, 0.0)
        out = jax.ops.segment_sum(H, jnp.asarray(s["recv"]),
                                  num_segments=s["num_nodes"])
        return jnp.sum(out * g_out)

    args = tuple(map(jnp.asarray, (s["A"], s["B"], s["Pe"], s["b1"])))
    g_fused = jax.grad(fused_loss, argnums=(0, 1, 2, 3))(*args)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(*args)
    names = ["dA", "dB", "dPe", "db1"]
    for name, a, b in zip(names, g_fused, g_ref):
        # both sides take Pe in layout order, so gradients align directly
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3, err_msg=name)
