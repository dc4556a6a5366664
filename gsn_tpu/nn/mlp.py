"""MLP block and activation registry (reference ``models_misc.py``).

The reference mlp is Linear stacks with optional BatchNorm1d between
hidden layers (never after the last) and a chosen activation.  Ours is a
flax module whose BN is masked so padded rows don't pollute statistics.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from gsn_tpu.ops.norm import MaskedBatchNorm


def choose_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if name == "elu":
        return nn.elu
    if name == "relu":
        return nn.relu
    if name == "tanh":
        return jnp.tanh
    if name == "identity":
        return lambda x: x
    raise NotImplementedError(f"activation {name!r}")


class MLP(nn.Module):
    """Linear stack: hidden widths ``d_hidden`` then ``d_out`` (last layer
    has no activation/BN), mirroring reference models_misc.py:18-59."""

    d_out: int
    d_hidden: Sequence[int] = ()
    activation: str = "elu"
    batch_norm: bool = False
    axis_name: str = None
    dtype: Optional[jnp.dtype] = None   # compute dtype (e.g. bf16)

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        act = choose_activation(self.activation)
        for i, d in enumerate(self.d_hidden):
            x = nn.Dense(d, dtype=self.dtype, name=f"dense_{i}")(x)
            if self.batch_norm:
                x = MaskedBatchNorm(name=f"bn_{i}",
                                    axis_name=self.axis_name)(
                    x, mask, use_running_average=not train)
            x = act(x)
        return nn.Dense(self.d_out, dtype=self.dtype,
                        name=f"dense_{len(self.d_hidden)}")(x)
