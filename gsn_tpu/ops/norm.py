"""Masked batch normalization.

The reference applies ``nn.BatchNorm1d`` over node (or edge) rows; since
torch batches have no padding, BN statistics see only real rows.  Our
padded batches must therefore compute *masked* statistics to preserve
activation parity (SURVEY.md §7 "Static shapes vs graph irregularity").

Torch parity details:
- eps 1e-5, momentum 0.1 (new = (1-m)*old + m*batch);
- normalization uses biased variance, running-var update uses the
  *unbiased* batch variance (torch BatchNorm semantics).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over rows with an optional row-validity mask."""

    use_running_average: bool = False
    momentum: float = 0.1
    epsilon: float = 1e-5
    dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 use_running_average: Optional[bool] = None) -> jnp.ndarray:
        use_ra = (self.use_running_average
                  if use_running_average is None else use_running_average)
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(d, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(d, jnp.float32))

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            if mask is None:
                n = jnp.asarray(x.shape[0], jnp.float32)
                mean = jnp.mean(x, axis=0)
                var = jnp.mean(jnp.square(x - mean), axis=0)
            else:
                m = mask.astype(jnp.float32)[:, None]
                n = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(x * m, axis=0) / n
                var = jnp.sum(jnp.square(x - mean) * m, axis=0) / n
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)

        y = (x - mean) * jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        return y * scale + bias
