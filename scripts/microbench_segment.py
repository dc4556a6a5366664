"""Microbenchmark: segment-sum strategies for edge aggregation on TPU.

Compares, at ZINC-batch scale:
1. jax.ops.segment_sum (XLA scatter-add), unsorted
2. jax.ops.segment_sum with indices_are_sorted=True (sorted receivers)
3. cumsum-diff over sorted edges (segment sum = cumsum[end]-cumsum[start])
4. one-hot matmul (MXU route, [N,E]@[E,d])

Informs the Pallas SpMM design (SURVEY §7 step 6).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=50):
    from gsn_tpu.timing import device_sync, fetch_rtt
    out = fn(*args)
    rtt = fetch_rtt(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    device_sync(out)
    return (time.perf_counter() - t0 - rtt) / iters


def main():
    rng = np.random.RandomState(0)
    N, E, D = 25600, 61440, 128
    recv = np.sort(rng.randint(0, N, E)).astype(np.int32)
    msgs = rng.randn(E, D).astype(np.float32)

    starts = np.searchsorted(recv, np.arange(N)).astype(np.int32)
    ends = np.searchsorted(recv, np.arange(N), side="right").astype(np.int32)

    recv_j = jnp.asarray(recv)
    msgs_j = jnp.asarray(msgs)
    starts_j, ends_j = jnp.asarray(starts), jnp.asarray(ends)

    @jax.jit
    def scatter_unsorted(m, r):
        return jax.ops.segment_sum(m, r, num_segments=N)

    @jax.jit
    def scatter_sorted(m, r):
        return jax.ops.segment_sum(m, r, num_segments=N,
                                   indices_are_sorted=True)

    @jax.jit
    def cumsum_diff(m, s, e):
        cs = jnp.concatenate([jnp.zeros((1, D), m.dtype),
                              jnp.cumsum(m, axis=0)], 0)
        return cs[e] - cs[s]

    ref = np.asarray(scatter_unsorted(msgs_j, recv_j))
    for name, fn, args in [
        ("scatter_unsorted", scatter_unsorted, (msgs_j, recv_j)),
        ("scatter_sorted", scatter_sorted, (msgs_j, recv_j)),
        ("cumsum_diff", cumsum_diff, (msgs_j, starts_j, ends_j)),
    ]:
        got = np.asarray(fn(*args))
        err = np.abs(got - ref).max()
        dt = timeit(fn, *args)
        gbps = (E * D * 4 + N * D * 4) / dt / 1e9
        print(f"{name:18s} {dt * 1e3:7.3f} ms  {gbps:6.1f} GB/s  "
              f"maxerr {err:.2e}")

    # gather bench (the SDDMM side)
    x = jnp.asarray(rng.randn(N, D).astype(np.float32))

    @jax.jit
    def gather(x, r):
        return x[r]

    dt = timeit(gather, x, recv_j)
    print(f"{'gather[E,D]':18s} {dt * 1e3:7.3f} ms  "
          f"{(E * D * 4) / dt / 1e9:6.1f} GB/s")


if __name__ == "__main__":
    main()
