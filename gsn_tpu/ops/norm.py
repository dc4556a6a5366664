"""Masked batch normalization (optionally cross-replica).

The reference applies ``nn.BatchNorm1d`` over node (or edge) rows; since
torch batches have no padding, BN statistics see only real rows.  Our
padded batches must therefore compute *masked* statistics to preserve
activation parity (SURVEY.md §7 "Static shapes vs graph irregularity").

Under data parallelism the reference's single-device BN sees the whole
batch; set ``axis_name`` (inside shard_map/pjit) to psum the masked
moment sums across replicas and keep that parity (SURVEY §7 "BN + DP").

Torch parity details:
- eps 1e-5, momentum 0.1 (new = (1-m)*old + m*batch);
- normalization uses biased variance, running-var update uses the
  *unbiased* batch variance (torch BatchNorm semantics).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over rows with an optional row-validity mask."""

    use_running_average: bool = False
    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None   # cross-replica stats when set

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray],
                 mask: Optional[jnp.ndarray] = None,
                 use_running_average: Optional[bool] = None,
                 moments: Optional[tuple] = None):
        """Normalize ``x`` — or, when ``x is None`` and ``moments=(n,
        sum_x, sum_x2)`` is given, run only the statistics machinery
        (same params/batch_stats tree, same running-stat updates) and
        return ``(mean, var, scale, bias)`` so a fused kernel can fold
        the normalization into its affine inputs."""
        use_ra = (self.use_running_average
                  if use_running_average is None else use_running_average)
        # bf16 activations (compute_dtype mode): statistics accumulate in
        # f32 and the normalized output is emitted back in the input
        # dtype, so x can travel bf16 across layer boundaries without
        # per-layer f32<->bf16 convert fusions.
        in_dtype = x.dtype if x is not None else None
        low_prec = in_dtype is not None and in_dtype != jnp.float32
        xf = x.astype(jnp.float32) if low_prec else x
        d = x.shape[-1] if x is not None else moments[1].shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(d, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(d, jnp.float32))

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            # NB (r5, measured): re-expressing these column sums as MXU
            # ones-dots / Gram diagonals ([1,N]@[N,d], diag([d,N]@[N,d]))
            # does NOT beat the VPU reduce on chip — each such dot cost
            # ~0.33 ms on the molhiv [31k, 300] shape (≈ the reduce it
            # replaced) and the extra ~20 of them regressed the step
            # 2.99M -> 2.45M edges/s.  Keep the plain reductions.
            if moments is not None:
                n, sum_x, sum_x2 = moments
                n = jnp.asarray(n, jnp.float32)
            elif mask is None:
                n = jnp.asarray(x.shape[0], jnp.float32)
                sum_x = jnp.sum(xf, axis=0)
                sum_x2 = jnp.sum(jnp.square(xf), axis=0)
            else:
                m = mask.astype(jnp.float32)[:, None]
                n = jnp.sum(m)
                sum_x = jnp.sum(xf * m, axis=0)
                sum_x2 = jnp.sum(jnp.square(xf) * m, axis=0)
            if self.axis_name is not None:
                n = jax.lax.psum(n, self.axis_name)
                sum_x = jax.lax.psum(sum_x, self.axis_name)
                sum_x2 = jax.lax.psum(sum_x2, self.axis_name)
            n = jnp.maximum(n, 1.0)
            mean = sum_x / n
            var = jnp.maximum(sum_x2 / n - jnp.square(mean), 0.0)
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)

        if x is None:
            return mean, var, scale, bias
        if low_prec:
            # folded per-channel affine: one elementwise fusion reading
            # and writing the input dtype (f32 math on the [d] vectors)
            s = scale * jnp.reciprocal(jnp.sqrt(var + self.epsilon))
            t = bias - mean * s
            return (xf * s + t).astype(in_dtype)
        y = (x - mean) * jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        return y * scale + bias
