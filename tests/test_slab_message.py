"""Slab fused kernel (v2, dense edges) vs jax oracle, fwd + grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsn_tpu.ops.pallas.slab_message import (build_slab_metadata,
                                             slab_edge_message_aggregate)

BN, BE = 128, 256


def setup(seed=0, n_graphs=14, d1=32, with_pe=True, e_pad=0):
    rng = np.random.RandomState(seed)
    recv, send = [], []
    off = 0
    for _ in range(n_graphs):
        g_n = rng.randint(6, 40)
        for _ in range(g_n * 2):
            u, v = rng.randint(0, g_n, 2)
            if u != v:
                recv.append(off + u)
                send.append(off + v)
        off += g_n
    order = np.argsort(recv, kind="stable")
    recv = np.array(recv)[order]
    send = np.array(send)[order]
    E_real = len(recv)
    # pad edge arrays to a chunk multiple (batch-style tail padding)
    E = -(-(E_real + e_pad) // BE) * BE
    recv = np.concatenate([recv, np.zeros(E - E_real, np.int64)])
    send = np.concatenate([send, np.zeros(E - E_real, np.int64)])
    mask = np.arange(E) < E_real

    N = off
    num_nodes = max(-(-N // BN), 4) * BN
    meta = build_slab_metadata(recv, send, mask, num_nodes, BN, BE)
    assert meta is not None

    A = rng.randn(N, d1).astype(np.float32)
    B = rng.randn(N, d1).astype(np.float32)
    b1 = rng.randn(d1).astype(np.float32)
    C = len(meta["fb"])
    Pe = (rng.randn(C * BE, d1).astype(np.float32) * 0.1
          if with_pe else None)
    fb_wf = np.stack([meta["fb"], meta["wf"]])
    return dict(N=N, E=E_real, recv=recv[:E_real], send=send[:E_real],
                meta=meta, fb_wf=fb_wf, A=A, B=B, b1=b1, Pe=Pe,
                num_nodes=num_nodes, mask=mask)


def oracle(s):
    H = s["A"][s["recv"]] + s["B"][s["send"]] + s["b1"]
    if s["Pe"] is not None:
        H = H + s["Pe"][:s["E"]]
    H = np.maximum(H, 0.0)
    out = np.zeros((s["num_nodes"], s["A"].shape[1]), np.float32)
    np.add.at(out, s["recv"], H)
    return out


@pytest.mark.parametrize("with_pe,e_pad", [(True, 0), (False, 37)])
def test_slab_forward(with_pe, e_pad):
    s = setup(with_pe=with_pe, e_pad=e_pad)
    out = np.asarray(slab_edge_message_aggregate(
        jnp.asarray(s["A"]), jnp.asarray(s["B"]),
        jnp.asarray(s["Pe"]) if with_pe else jnp.zeros((1, 1)),
        jnp.asarray(s["b1"]),
        jnp.asarray(s["meta"]["recv_local"]),
        jnp.asarray(s["meta"]["send_local"]),
        jnp.asarray(s["fb_wf"]), s["N"],
        s["num_nodes"], BN, BE, "relu", with_pe, True, None,
        "float32", True, s["meta"]["s_s"]))
    np.testing.assert_allclose(out, oracle(s), rtol=1e-4, atol=1e-4)


def test_slab_gradients():
    s = setup(with_pe=True)
    g_out = np.random.RandomState(7).randn(
        s["num_nodes"], s["A"].shape[1]).astype(np.float32)

    def fused_loss(A, B, Pe, b1):
        out = slab_edge_message_aggregate(
            A, B, Pe, b1,
            jnp.asarray(s["meta"]["recv_local"]),
            jnp.asarray(s["meta"]["send_local"]),
            jnp.asarray(s["fb_wf"]), s["N"],
            s["num_nodes"], BN, BE, "relu", True, True, None,
            "float32", True, s["meta"]["s_s"])
        return jnp.sum(out * g_out)

    def ref_loss(A, B, Pe, b1):
        H = A[s["recv"]] + B[s["send"]] + Pe[:s["E"]] + b1
        H = jnp.maximum(H, 0.0)
        out = jax.ops.segment_sum(H, jnp.asarray(s["recv"]),
                                  num_segments=s["num_nodes"])
        return jnp.sum(out * g_out)

    args = tuple(map(jnp.asarray, (s["A"], s["B"], s["Pe"], s["b1"])))
    gf = jax.grad(fused_loss, argnums=(0, 1, 2, 3))(*args)
    gr = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(*args)
    for name, a, b in zip(["dA", "dB", "dPe", "db1"], gf, gr):
        a = np.asarray(a)
        b = np.asarray(b)
        if name == "dPe":
            a = a[:s["E"]]  # padding-slot grads are zero by construction
            b = b[:s["E"]]
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3,
                                   err_msg=name)


def test_bf16_idsq_moments_stay_f32():
    """ADVICE r3: under data_dtype='bfloat16' the joint [H, H^2] fused-BN
    moments pass must NOT round its slabs to bf16 — with an
    ill-conditioned activation (|mean| >> std) the BN variance
    E[H^2]-E[H]^2 computed from bf16-rounded moments loses nearly all
    significant digits.  Inputs are still bf16-rounded (matching the
    compute path); H/H^2 accumulate and travel f32."""
    s = setup(seed=3, d1=32)
    # ill-conditioned: H ~= 8 +- 0.5 -> E[H^2] ~ 64, var ~ 0.25.  bf16
    # slab moments err ~40% here (quantum of the per-chunk partial sums);
    # f32 moments land ~1e-3 relative.  (mean/std >~ 50 is beyond what
    # the E[H^2]-E[H]^2 form can deliver even in f32 — not tested.)
    s["A"] = (4.0 + 0.25 * s["A"]).astype(np.float32)
    s["B"] = (4.0 + 0.25 * s["B"]).astype(np.float32)
    s["b1"] = (0.25 * s["b1"]).astype(np.float32)
    s["Pe"] = (0.25 * s["Pe"]).astype(np.float32)

    out = np.asarray(slab_edge_message_aggregate(
        jnp.asarray(s["A"]), jnp.asarray(s["B"]), jnp.asarray(s["Pe"]),
        jnp.asarray(s["b1"]),
        jnp.asarray(s["meta"]["recv_local"]),
        jnp.asarray(s["meta"]["send_local"]),
        jnp.asarray(s["fb_wf"]), s["N"],
        s["num_nodes"], BN, BE, "id_sq", True, True, None, "bfloat16",
        True, s["meta"]["s_s"]))
    d1 = s["A"].shape[1]
    E = s["E"]
    mean = out[:, :d1].sum(0) / E
    var = out[:, d1:].sum(0) / E - mean ** 2

    # oracle from the same bf16-rounded inputs, f64 accumulation
    def r(x):
        return np.asarray(jnp.asarray(x).astype(jnp.bfloat16),
                          np.float64)
    H = r(s["A"])[s["recv"]] + r(s["B"])[s["send"]] \
        + r(s["Pe"])[:E] + s["b1"].astype(np.float64)
    mean_ref = H.mean(0)
    var_ref = (H ** 2).mean(0) - mean_ref ** 2
    np.testing.assert_allclose(mean, mean_ref, rtol=1e-5)
    # bf16-rounded moments would give O(1) relative error here
    np.testing.assert_allclose(var, var_ref, rtol=2e-2)


def test_metadata_rejects_wide_spans():
    # one sparse giant graph: 256 consecutive sorted receivers cover
    # >2*BN node ids -> builder must return None
    recv = np.arange(0, 512, 2)
    send = recv + 1
    mask = np.ones(256, bool)
    assert build_slab_metadata(recv, send, mask, 512, BN, BE) is None
