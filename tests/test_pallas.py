"""Pallas kernel tests (interpret mode on CPU; the compiled path is
exercised on real hardware by bench/microbench scripts)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gsn_tpu.ops.pallas.segment_mxu import (build_block_aligned_layout,
                                            segment_sum_via_mxu)


def ref_segment_sum(msgs, recv, n):
    out = np.zeros((n, msgs.shape[1]), np.float32)
    np.add.at(out, recv, msgs)
    return out


@pytest.mark.parametrize("seed,n,e,d,bn,be", [
    (0, 512, 1700, 64, 128, 256),
    (1, 256, 100, 32, 128, 128),    # sparse: many empty blocks
    (2, 128, 4000, 16, 128, 512),   # dense: many chunks per block
])
def test_mxu_segment_sum_matches(seed, n, e, d, bn, be):
    rng = np.random.RandomState(seed)
    recv = np.sort(rng.randint(0, n, e))
    msgs = rng.randn(e, d).astype(np.float32)
    layout = build_block_aligned_layout(recv, n, block_n=bn, block_e=be)
    got = np.asarray(segment_sum_via_mxu(
        jnp.asarray(msgs), layout, n, interpret=True))
    np.testing.assert_allclose(got, ref_segment_sum(msgs, recv, n),
                               rtol=1e-5, atol=1e-5)


def test_layout_structure():
    recv = np.array([0, 0, 3, 200, 201, 260])
    layout = build_block_aligned_layout(recv, 512, block_n=128, block_e=128)
    # blocks: 0 (3 edges), 1 (2 edges), 2 (1 edge), 3 (0 edges, still 1
    # chunk) + one trailing all-padding chunk
    assert layout["chunk_nb"].tolist() == [0, 1, 2, 3, 3]
    assert layout["chunk_first"].tolist() == [1, 1, 1, 1, 0]
    # all real edges present exactly once
    mask = layout["recv_local"] >= 0
    assert mask.sum() == len(recv)
    np.testing.assert_array_equal(np.sort(layout["perm"][mask]),
                                  np.arange(len(recv)))


def test_empty_blocks_zeroed():
    recv = np.array([300, 300])
    msgs = np.ones((2, 8), np.float32)
    layout = build_block_aligned_layout(recv, 512, block_n=128, block_e=128)
    got = np.asarray(segment_sum_via_mxu(
        jnp.asarray(msgs), layout, 512, interpret=True))
    assert got[300].sum() == 16.0
    assert np.abs(got).sum() == 16.0  # everything else zero


def test_mxu_segment_sum_gradient():
    """custom_vjp backward must equal the segment-sum transpose
    (gather of cotangent rows by receiver)."""
    import jax

    rng = np.random.RandomState(5)
    n, e, d = 256, 700, 32
    recv = np.sort(rng.randint(0, n, e))
    msgs = rng.randn(e, d).astype(np.float32)
    g_out = rng.randn(n, d).astype(np.float32)
    layout = build_block_aligned_layout(recv, n, block_n=128, block_e=128)

    def f(m):
        return jnp.sum(segment_sum_via_mxu(m, layout, n,
                                           interpret=True)
                       * jnp.asarray(g_out))

    got = np.asarray(jax.grad(f)(jnp.asarray(msgs)))
    want = g_out[recv]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_mxu_with_edge_mask_and_static_chunks():
    from gsn_tpu.ops.pallas.segment_mxu import static_num_chunks

    rng = np.random.RandomState(6)
    n, e_real, d = 256, 500, 16
    recv_real = np.sort(rng.randint(0, n, e_real))
    e_cap = 768
    recv = np.concatenate([recv_real, np.zeros(e_cap - e_real, np.int64)])
    mask = np.concatenate([np.ones(e_real, bool),
                           np.zeros(e_cap - e_real, bool)])
    msgs = rng.randn(e_cap, d).astype(np.float32)

    C = static_num_chunks(e_cap, n, block_n=128, block_e=128)
    layout = build_block_aligned_layout(recv, n, block_n=128, block_e=128,
                                        edge_mask=mask, num_chunks=C)
    assert len(layout["chunk_nb"]) == C
    got = np.asarray(segment_sum_via_mxu(
        jnp.asarray(msgs), layout, n, interpret=True))
    want = ref_segment_sum(msgs[:e_real], recv_real, n)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
