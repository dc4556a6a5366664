"""Discrete-feature embedding library.

TPU-native re-design of the reference ``DiscreteEmbedding`` family
(``utils_graph_learning.py:44-260``): a uniform wrapper mapping
categorical matrices to dense features.  Kinds:

- ``zero_encoder``     : zeros of width d_out
- ``linear``           : Dense over float input
- ``mlp``              : MLP over float input
- ``one_hot_encoder``  : per-column one-hot concat (vocab sizes d_in)
- ``embedding``        : per-column nn.Embed, summed or concatenated
- ``atom_one_hot_encoder`` / ``bond_one_hot_encoder``: OGB categorical
  one-hots with the standard mol feature dims
- ``atom_encoder`` / ``bond_encoder``: OGB-style summed embeddings
- ``None``             : passthrough (as float)

OGB feature dimensions reproduce ogb.utils.features
get_atom_feature_dims()/get_bond_feature_dims() so molhiv-format inputs
embed identically.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .mlp import MLP

# ogb.utils.features allowable-feature vocabulary sizes
ATOM_FEATURE_DIMS = [119, 4, 12, 12, 10, 6, 6, 2, 2]
BOND_FEATURE_DIMS = [5, 6, 2]


def _as_2d(x: jnp.ndarray) -> jnp.ndarray:
    return x[:, None] if x.ndim == 1 else x


def _match_vma(primal, cot):
    """psum a cotangent over mesh axes the primal does not vary on —
    required of custom_vjp rules under a checked shard_map (see
    ops/pallas/slab_message._match_vma); no-op outside shard_map."""
    try:
        extra = tuple(jax.typeof(cot).vma - jax.typeof(primal).vma)
    except Exception:
        return cot
    return jax.lax.psum(cot, extra) if extra else cot


def _embed_lookup_mxu(table: jnp.ndarray, idx: jnp.ndarray):
    """Row lookup as a one-hot MXU matmul.

    TPU scatter (the gather's transpose) lowers to a slow sort-based loop
    (~0.5 ms per table on the bench workload); the one-hot matmul and its
    transpose both run on the MXU in ~10 us for small vocabularies.
    Numerics are exactly the plain gather: the one-hot row has a single
    1.0, so each output element is x·1 plus exact zeros.

    The forward dot uses Precision.HIGH (exact for one-hot x f32).  The
    BACKWARD is a custom rule: for a bf16 cotangent (the compute_dtype
    path) the table gradient is ONE default-precision pass with f32
    accumulation — EXACT (0/1 x bf16 products are exact), whereas
    inheriting HIGH forced a bf16x3 split that materialized f32 [E, d]
    copies of the cotangent (~0.7 ms/step on molhiv).  f32 cotangents
    keep the HIGH path.  The rule psums replicated-table cotangents
    itself (shard_map vma contract).
    """
    idx = idx.astype(jnp.int32)
    v = table.shape[0]

    def _oh(dtype):
        return (idx[:, None]
                == jnp.arange(v, dtype=jnp.int32)[None, :]).astype(dtype)

    @jax.custom_vjp
    def lookup(tab):
        return jax.lax.dot_general(
            _oh(tab.dtype), tab, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=tab.dtype,
            precision=jax.lax.Precision.HIGH)

    def lookup_fwd(tab):
        return lookup(tab), tab

    def lookup_bwd(tab, g):
        dn = (((0,), (0,)), ((), ()))   # contract the row axis
        if g.dtype == jnp.bfloat16:
            dtab = jax.lax.dot_general(
                _oh(jnp.bfloat16), g, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
        else:
            dtab = jax.lax.dot_general(
                _oh(g.dtype), g, dimension_numbers=dn,
                preferred_element_type=g.dtype,
                precision=jax.lax.Precision.HIGH)
        return (_match_vma(tab, dtab.astype(tab.dtype)),)

    lookup.defvjp(lookup_fwd, lookup_bwd)
    return lookup(table)


class _MXUGradEmbed(nn.Embed):
    """nn.Embed computed as a one-hot matmul (identical param tree)."""

    def __call__(self, inputs):
        return _embed_lookup_mxu(self.embedding, inputs)


# above this vocabulary size the [rows, vocab] one-hot built in the
# backward costs more HBM traffic than the scatter it replaces
MXU_GRAD_MAX_VOCAB = 128


class MultiEmbedding(nn.Module):
    """Per-column embedding tables with sum or concat aggregation
    (reference multi_embedding, utils_graph_learning.py:134-167)."""

    vocab_sizes: Sequence[int]
    d_out: int
    aggr: str = "concat"
    zeros_init: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = _as_2d(x).astype(jnp.int32)
        init = (nn.initializers.zeros if self.zeros_init
                else nn.initializers.xavier_uniform())
        outs = []
        for i, v in enumerate(self.vocab_sizes):
            cls = _MXUGradEmbed if v <= MXU_GRAD_MAX_VOCAB else nn.Embed
            emb = cls(v, self.d_out, embedding_init=init,
                      name=f"embed_{i}")(x[:, i])
            outs.append(emb)
        if self.aggr == "concat":
            return jnp.concatenate(outs, axis=1)
        if self.aggr == "sum":
            return sum(outs)
        raise NotImplementedError(f"multi embedding aggr {self.aggr!r}")


def one_hot_concat(x: jnp.ndarray, vocab_sizes: Sequence[int]) -> jnp.ndarray:
    """Per-column one-hot concat (reference one_hot_encoder)."""
    x = _as_2d(x).astype(jnp.int32)
    outs = [jax.nn.one_hot(x[:, i], v, dtype=jnp.float32)
            for i, v in enumerate(vocab_sizes)]
    return jnp.concatenate(outs, axis=1)


class DiscreteEmbedding(nn.Module):
    """Uniform categorical/dense feature encoder (see module docstring)."""

    kind: str
    d_in_features: int                      # input columns (if dense)
    d_in_encoder: Optional[Sequence[int]]   # per-column vocab sizes
    d_out_encoder: Optional[int]
    aggr: str = "concat"
    activation_mlp: str = "elu"
    bn_mlp: bool = False
    features_scope: str = "full"
    zeros_init: bool = False
    axis_name: str = None

    @property
    def d_out(self) -> int:
        k = self.kind
        if k in ("zero_encoder", "linear", "mlp", "atom_encoder",
                 "bond_encoder"):
            return self.d_out_encoder
        if k == "one_hot_encoder":
            return sum(self.d_in_encoder)
        if k == "embedding":
            return (len(self.d_in_encoder) * self.d_out_encoder
                    if self.aggr == "concat" else self.d_out_encoder)
        if k == "atom_one_hot_encoder":
            return sum(self._atom_dims())
        if k == "bond_one_hot_encoder":
            return sum(self._bond_dims())
        if k == "None":
            return self.d_in_features
        raise NotImplementedError(f"encoder {k!r}")

    def _atom_dims(self):
        return (ATOM_FEATURE_DIMS if self.features_scope == "full"
                else ATOM_FEATURE_DIMS[:2])

    def _bond_dims(self):
        return (BOND_FEATURE_DIMS if self.features_scope == "full"
                else BOND_FEATURE_DIMS[:2])

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        k = self.kind
        x = _as_2d(x)
        if k == "zero_encoder":
            return jnp.zeros((x.shape[0], self.d_out_encoder), jnp.float32)
        if k == "linear":
            return nn.Dense(self.d_out_encoder)(x.astype(jnp.float32))
        if k == "mlp":
            return MLP(self.d_out_encoder, (self.d_out_encoder,),
                       self.activation_mlp, self.bn_mlp,
                       axis_name=self.axis_name)(
                           x.astype(jnp.float32), mask, train)
        if k == "one_hot_encoder":
            return one_hot_concat(x, self.d_in_encoder)
        if k == "embedding":
            return MultiEmbedding(tuple(self.d_in_encoder),
                                  self.d_out_encoder, self.aggr,
                                  self.zeros_init)(x)
        if k == "atom_one_hot_encoder":
            return one_hot_concat(x, self._atom_dims())
        if k == "bond_one_hot_encoder":
            return one_hot_concat(x, self._bond_dims())
        if k == "atom_encoder":
            return MultiEmbedding(tuple(self._atom_dims()),
                                  self.d_out_encoder, "sum")(x)
        if k == "bond_encoder":
            return MultiEmbedding(tuple(self._bond_dims()),
                                  self.d_out_encoder, "sum")(x)
        if k == "None":
            return x.astype(jnp.float32)
        raise NotImplementedError(f"encoder {k!r}")


class CentralEncoder(nn.Module):
    """Dummy self-loop feature for GIN-style aggregation (reference
    central_encoder, utils_graph_learning.py:211-260).

    Returns ``(x_central [N, d_out], x_nb [E, d_out])``:
    - one-hot kinds with extend: neighbor features get a zero column
      prepended; central nodes get the one-hot of that new category;
    - embedding kinds with extend: central nodes share one learned vector;
    - without extend: central features are zeros.
    """

    nb_encoder_kind: str
    d_ef: int
    extend: bool = True

    @nn.compact
    def __call__(self, x_nb: jnp.ndarray, num_nodes: int):
        one_hot = "one_hot_encoder" in self.nb_encoder_kind
        if one_hot and self.extend:
            zero_col = jnp.zeros((x_nb.shape[0], 1), x_nb.dtype)
            x_nb = jnp.concatenate([zero_col, x_nb], axis=1)
            eye = jnp.eye(self.d_ef + 1, dtype=jnp.float32)
            x_central = jnp.tile(eye[0][None, :], (num_nodes, 1))
        elif not one_hot and self.extend:
            vec = self.param("central", nn.initializers.xavier_uniform(),
                             (1, self.d_ef))
            x_central = jnp.tile(vec, (num_nodes, 1))
        else:
            x_central = jnp.zeros((num_nodes, self.d_out), jnp.float32)
        return x_central, x_nb

    @property
    def d_out(self) -> int:
        if "one_hot_encoder" in self.nb_encoder_kind and self.extend:
            return self.d_ef + 1
        return self.d_ef
