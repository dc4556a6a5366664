"""Accumulating Pallas slab-combine kernel (ops/pallas/slab_combine.py)
against a dense numpy reference, for sorted (recv-side fb) and unsorted
(send-side wf) keys."""

import jax.numpy as jnp
import numpy as np
import pytest

from gsn_tpu.ops.pallas.slab_combine import combine_kc, slab_combine_sum


def _reference(slabs, key, span, num_blocks, block_n, d):
    out = np.zeros((num_blocks * block_n, d), np.float32)
    C = slabs.shape[0]
    rows = slabs.reshape(C, span, block_n, d)
    for t in range(C):
        for j in range(span):
            b = key[t] + j
            if b < num_blocks:
                out[b * block_n:(b + 1) * block_n] += rows[t, j]
    return out


@pytest.mark.parametrize("sorted_key", [True, False])
def test_slab_combine_sum_matches_reference(sorted_key):
    rng = np.random.RandomState(0 if sorted_key else 1)
    C, span, block_n, d, num_blocks = 17, 3, 8, 10, 9
    key = rng.randint(0, num_blocks - span + 1, C).astype(np.int32)
    if sorted_key:
        key = np.sort(key)
    slabs = rng.randn(C, span * block_n, d).astype(np.float32)

    kc = combine_kc(key, span, num_blocks)
    assert kc is not None
    got = np.asarray(slab_combine_sum(
        jnp.asarray(slabs), jnp.asarray(key), span, num_blocks,
        block_n, d, kc, interpret=True))
    want = _reference(slabs, key, span, num_blocks, block_n, d)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_combine_kc_counts():
    # blocks 0..4; chunks with fb [0, 0, 1, 3], span 2:
    # block 0 <- t0,t1; block 1 <- t0,t1,t2; block 2 <- t2; 3 <- t3; 4 <- t3
    kc = combine_kc(np.array([0, 0, 1, 3]), 2, 5)
    assert kc == 4      # ladder rung above need=3
    assert combine_kc(np.zeros(40, int), 2, 5) is None   # beyond ladder


def test_minmax_cnt_combine_matches_xla():
    """The two-pass max+tie-count combine kernel vs the XLA
    _minmax_combine_cnt reference (slab_minmax.py)."""
    from gsn_tpu.ops.pallas.slab_combine import slab_combine_minmax_cnt
    from gsn_tpu.ops.pallas.slab_minmax import (NEG,
                                                _minmax_combine_cnt)

    rng = np.random.RandomState(3)
    C, block_n, d2, num_blocks = 11, 8, 6, 7
    span = 2   # S_R
    key = np.sort(rng.randint(0, num_blocks - span + 1, C)).astype(
        np.int32)
    # quantized values so cross-chunk ties actually occur
    mm = np.where(rng.rand(C, span * block_n, d2) < 0.3, NEG,
                  rng.randint(-3, 4, (C, span * block_n, d2))
                  ).astype(np.float32)
    cnt = rng.randint(0, 5, (C, span * block_n, d2)).astype(np.float32)

    raw_ref, cnt_ref = _minmax_combine_cnt(
        jnp.asarray(mm), jnp.asarray(cnt), jnp.asarray(key),
        num_blocks, block_n, d2)
    raw_got, cnt_got = slab_combine_minmax_cnt(
        jnp.asarray(mm), jnp.asarray(cnt), jnp.asarray(key), span,
        num_blocks, block_n, d2, kc=8, interpret=True)
    np.testing.assert_allclose(np.asarray(raw_got), np.asarray(raw_ref),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cnt_got), np.asarray(cnt_ref),
                               rtol=1e-6)


def test_bf16_slabs_exact():
    rng = np.random.RandomState(2)
    C, span, block_n, d, num_blocks = 6, 2, 8, 4, 5
    key = np.sort(rng.randint(0, num_blocks - span + 1, C)).astype(np.int32)
    slabs = rng.randn(C, span * block_n, d).astype(jnp.bfloat16)
    kc = combine_kc(key, span, num_blocks)
    got = np.asarray(slab_combine_sum(
        jnp.asarray(slabs), jnp.asarray(key), span, num_blocks,
        block_n, d, kc, interpret=True))
    want = _reference(np.asarray(slabs, np.float32), key, span,
                      num_blocks, block_n, d)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
