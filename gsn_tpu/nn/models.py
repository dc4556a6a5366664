"""Model assemblies: GNNSubstructures, GNN_OGB (virtual node), and the
MLP no-message-passing baseline.

TPU-native re-designs of reference ``models_graph_classification.py``,
``models_graph_classification_ogb_original.py`` and
``models_graph_classification_mlp.py``.  All operate on a padded
``GraphBatch`` and mask every statistic (BN, pooling, loss inputs) so the
numerics match the reference's unpadded execution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from gsn_tpu.config import GSNConfig
from gsn_tpu.graphs.container import GraphBatch
from gsn_tpu.ops.norm import MaskedBatchNorm
from gsn_tpu.ops.segment import (broadcast_graph_to_nodes,
                                 global_add_pool, global_mean_pool)
from .embedding import DiscreteEmbedding
from .filters import GSNLayer
from .mlp import MLP, choose_activation


def rbg_key(key):
    """Re-wrap a threefry key as an ``rbg`` key (XLA RngBitGenerator).

    Threefry spends real VPU time hashing per 32 generated bits; the
    hardware bit generator is ~free.  Dropout masks need iid bits, not
    threefry's counter-based splittability, so the conversion (tile the
    2-word threefry key data to rbg's 4-word state) is sound: distinct
    input keys map to distinct rbg states.  Fold any per-shard/axis
    indices into the threefry key BEFORE converting."""
    kd = key
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        kd = jax.random.key_data(key)
    kd = jnp.tile(kd.ravel()[:2], 2).astype(jnp.uint32)
    return jax.random.wrap_key_data(kd, impl="rbg")


class NodeDropout(nn.Module):
    """Dropout over NODE rows that stays decorrelated across
    edge-partition shards.

    Under shard_map the 'dropout' PRNG key is replicated, so a plain
    ``nn.Dropout`` on node-level features would draw the *same* mask
    pattern in every node block (shards hold different rows — correlated
    masks break the iid-dropout semantics the reference trains with,
    models_graph_classification_ogb_original.py:242-245).  Folding the
    key with ``lax.axis_index(ep_axis)`` gives each shard an independent
    stream while graph-level dropout (replicated rows) keeps the shared
    key.  Identical to nn.Dropout when ``ep_axis`` is None.

    ``rng_impl='rbg'`` draws the mask bits from the hardware bit
    generator instead of threefry (same iid-bernoulli semantics,
    different stream; measurably cheaper on large node arrays)."""

    rate: float
    ep_axis: str = None
    rng_impl: str = "threefry"

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if deterministic or self.rate == 0.0:
            return x
        key = self.make_rng("dropout")
        if self.ep_axis is not None:
            key = jax.random.fold_in(
                key, jax.lax.axis_index(self.ep_axis))
        if self.rng_impl == "rbg":
            key = rbg_key(key)
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(key, p=keep, shape=x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


def _pool_fn(readout: str):
    if readout == "sum":
        return global_add_pool
    if readout == "mean":
        return global_mean_pool
    raise ValueError(f"invalid readout {readout!r}")


def _make_pool(readout: str, data: GraphBatch, compute_dtype=None):
    """Node-level pooling closure; routes through the Pallas one-hot MXU
    pool kernel when the batch carries slab-pool metadata.  Under
    ``compute_dtype='bfloat16'`` the kernel path rounds node rows to bf16
    (single-pass one-hot dots; the pooled sum still accumulates f32).

    NOTE (documented numeric divergence): the bf16 rounding of pooled
    rows applies only on the SLAB layout — the same config on a plain
    (no slab-pool metadata) batch pools exact f32 rows.  Layout-parity
    comparisons under ``compute_dtype='bfloat16'`` must therefore allow
    one bf16 rounding of the readout inputs; this is an intentional
    perf choice of the kernel path, not a bug."""
    fn = _pool_fn(readout)
    seg = (None if data.pool_recv_local is None
           else (data.pool_recv_local, data.pool_fb, data.pool_block_g,
                 data.pool_counts))

    def pool(x, batch, num_graphs, node_mask):
        if seg is not None:
            if compute_dtype == "bfloat16":
                x = x.astype(jnp.bfloat16)
        elif x.dtype == jnp.bfloat16:
            # XLA segment-sum path: accumulate pooled sums in f32
            x = x.astype(jnp.float32)
        return fn(x, batch, num_graphs, node_mask, pool_seg=seg,
                  axis_name=data.ep_axis)

    return pool


class GNNSubstructures(nn.Module):
    """Main GSN model (reference models_graph_classification.py:15-247).

    Layer i is a GSN filter iff (i == 0 or inject_ids) and the model is a
    GSN variant; later layers degrade to plain MPNN when ids are not
    injected (reference :147-155).  Jumping-knowledge projections of
    pooled intermediate representations are summed into the prediction,
    with dropout applied after each projection (reference :236-242).
    """

    cfg: GSNConfig

    @nn.compact
    def __call__(self, data: GraphBatch, train: bool = False):
        c = self.cfg
        nm, em = data.node_mask, data.edge_mask
        num_graphs = data.num_graph_slots
        pool = _make_pool(c.readout, data, c.compute_dtype)

        degrees = DiscreteEmbedding(
            c.degree_embedding, 1, c.d_degree, c.d_out_degree_embedding,
            aggr=c.multi_embedding_aggr, activation_mlp=c.activation_mlp,
            bn_mlp=c.bn_mlp, name="degree_encoder")(data.degrees, nm, train)

        x = DiscreteEmbedding(
            c.input_node_encoder, c.in_features, c.d_in_node_encoder,
            c.d_out_node_encoder, aggr=c.multi_embedding_aggr,
            activation_mlp=c.activation_mlp, bn_mlp=c.bn_mlp,
            features_scope=c.features_scope,
            name="input_node_encoder")(data.x, nm, train)

        if c.random_features:
            # reference :212-214: uniform [0,1) features refreshed per call
            r = jax.random.uniform(
                self.make_rng("random_features"),
                (x.shape[0], c.d_out[0]), jnp.float32)
            x = jnp.concatenate([x, r], axis=1)
        if c.compute_dtype:
            # activations travel in the compute dtype end-to-end (BN
            # stats, pooled readouts and the head stay f32)
            x = x.astype(jnp.dtype(c.compute_dtype))

        act = choose_activation(c.activation)
        x_interm = [x]

        num_id_enc = len(c.d_out) if c.inject_ids else 1
        num_ef_enc = len(c.d_out) if c.inject_edge_features else 1
        id_encoders = [DiscreteEmbedding(
            c.id_embedding, len(c.d_in_id), c.d_in_id,
            c.d_out_id_embedding, aggr=c.multi_embedding_aggr,
            activation_mlp=c.activation_mlp, bn_mlp=c.bn_mlp,
            name=f"id_encoder_{j}") for j in range(num_id_enc)] \
            if c.uses_ids else []
        ef_encoders = [DiscreteEmbedding(
            c.edge_encoder, c.in_edge_features, c.d_in_edge_encoder,
            c.d_out_edge_encoder[j], aggr=c.multi_embedding_aggr,
            activation_mlp=c.activation_mlp, bn_mlp=c.bn_mlp,
            features_scope=c.features_scope,
            name=f"edge_encoder_{j}") for j in range(num_ef_enc)] \
            if c.uses_edge_features else []

        for i in range(len(c.d_out)):
            use_ids = ((i > 0 and c.inject_ids) or i == 0) and c.uses_ids
            use_efs = (((i > 0 and c.inject_edge_features) or i == 0)
                       and c.uses_edge_features)

            ids_i = None
            if c.uses_ids:
                ids_i = id_encoders[i if c.inject_ids else 0](
                    data.identifiers,
                    em if c.id_scope == "local" else nm, train)

            ef_i = None
            if c.uses_edge_features and data.edge_features is not None:
                ef_i = ef_encoders[i if c.inject_edge_features else 0](
                    data.edge_features, em, train)

            if c.compute_dtype:
                # encoder outputs travel in the compute dtype (one-hot /
                # embedding values are bf16-exact; the message MLP casts
                # its inputs to the compute dtype anyway)
                if ids_i is not None:
                    ids_i = ids_i.astype(jnp.dtype(c.compute_dtype))
                if ef_i is not None:
                    ef_i = ef_i.astype(jnp.dtype(c.compute_dtype))

            x = GSNLayer(
                d_up=c.d_out[i], d_msg=c.d_msg[i], d_h=tuple(c.d_h[i]),
                msg_kind=c.msg_kind, id_scope=c.id_scope,
                use_ids=use_ids, use_edge_features=use_efs,
                degree_as_tag=c.degree_as_tag[i],
                retain_features=c.retain_features[i],
                aggr=c.aggr, flow=c.flow,
                activation_mlp=c.activation_mlp, bn_mlp=c.bn_mlp,
                eps=0.0, train_eps=c.train_eps[i],
                id_embedding_kind=c.id_embedding,
                edge_embedding_kind=c.edge_encoder,
                extend_dims=c.extend_dims, axis_name=c.bn_axis_name,
                compute_dtype=c.compute_dtype, ep_axis=data.ep_axis,
                name=f"conv_{i}")(
                    x, data.edge_index, ids_i, degrees, ef_i, nm, em, train,
                    seg=(None if data.seg_recv_local is None
                         else (data.seg_recv_local, data.seg_chunks,
                               data.seg_block_n, data.seg_send_local,
                               data.seg_mode, data.seg_in_degree,
                               data.seg_s_s, data.seg_kc)))

            if c.bn[i]:
                x = MaskedBatchNorm(name=f"bn_{i}",
                                    axis_name=c.bn_axis_name)(
                    x, nm, use_running_average=not train)
            x = act(x)
            x_interm.append(x)

        prediction = jnp.zeros((num_graphs, c.out_features), jnp.float32)
        for i, xi in enumerate(x_interm):
            if c.final_projection[i]:
                xg = pool(xi, data.batch, num_graphs, nm)
                if c.jk_mlp:
                    proj = MLP(c.out_features,
                               tuple(c.d_h[min(i, len(c.d_h) - 1)]),
                               c.activation_mlp, c.bn_mlp,
                               name=f"lin_proj_{i}")(
                                   xg, data.graph_mask, train)
                else:
                    proj = nn.Dense(c.out_features,
                                    name=f"lin_proj_{i}")(xg)
                proj = nn.Dropout(c.dropout_features[i])(
                    proj, deterministic=not train)
                prediction = prediction + proj
        return prediction


class GNN_OGB(nn.Module):
    """OGB model with virtual node (reference
    models_graph_classification_ogb_original.py:17-268)."""

    cfg: GSNConfig

    @nn.compact
    def __call__(self, data: GraphBatch, train: bool = False):
        c = self.cfg
        nm, em = data.node_mask, data.edge_mask
        num_graphs = data.num_graph_slots
        pool = _make_pool(c.readout, data, c.compute_dtype)
        act = choose_activation(c.activation)
        L = len(c.d_out)

        degrees = DiscreteEmbedding(
            c.degree_embedding, 1, c.d_degree, c.d_out_degree_embedding,
            aggr=c.multi_embedding_aggr, activation_mlp=c.activation_mlp,
            bn_mlp=c.bn_mlp, name="degree_encoder")(data.degrees, nm, train)

        x = DiscreteEmbedding(
            c.input_node_encoder, c.in_features, c.d_in_node_encoder,
            c.d_out_node_encoder, aggr=c.multi_embedding_aggr,
            activation_mlp=c.activation_mlp, bn_mlp=c.bn_mlp,
            features_scope=c.features_scope,
            name="input_node_encoder")(data.x, nm, train)
        cdt = jnp.dtype(c.compute_dtype) if c.compute_dtype else None
        if cdt:
            # activations (x, vn) travel in the compute dtype end-to-end
            x = x.astype(cdt)

        if c.vn:
            # zeros-init embedding of a single category (reference :77-86)
            vn = DiscreteEmbedding(
                c.input_vn_encoder, 1, [1], c.d_out_vn_encoder,
                aggr=c.multi_embedding_aggr, zeros_init=True,
                name="vn_encoder")(
                    jnp.zeros((num_graphs, 1), jnp.int32), None, train)
            if cdt:
                vn = vn.astype(cdt)

        num_id_enc = L if c.inject_ids else 1
        id_encoders = [DiscreteEmbedding(
            c.id_embedding, len(c.d_in_id), c.d_in_id,
            c.d_out_id_embedding, aggr=c.multi_embedding_aggr,
            activation_mlp=c.activation_mlp, bn_mlp=c.bn_mlp,
            name=f"id_encoder_{j}") for j in range(num_id_enc)] \
            if c.model_name == "GSN_edge_sparse_ogb" else []
        ef_encoders = [DiscreteEmbedding(
            c.edge_encoder, c.in_edge_features, c.d_in_edge_encoder,
            c.d_out_edge_encoder[j], aggr=c.multi_embedding_aggr,
            activation_mlp=c.activation_mlp, bn_mlp=c.bn_mlp,
            features_scope=c.features_scope,
            name=f"edge_encoder_{j}") for j in range(L)]

        x_interm = [x]
        for i in range(L):
            use_ids = (((i > 0 and c.inject_ids) or i == 0)
                       and c.model_name == "GSN_edge_sparse_ogb")

            ids_i = None
            if c.model_name == "GSN_edge_sparse_ogb":
                ids_i = id_encoders[i if c.inject_ids else 0](
                    data.identifiers,
                    em if c.id_scope == "local" else nm, train)

            ef_i = None
            if data.edge_features is not None:
                ef_i = ef_encoders[i](data.edge_features, em, train)

            if cdt:
                # edge-level embedding outputs travel in the compute
                # dtype: per layer these are [E, 300] streams on molhiv
                # (f32 materializations cost ~0.1 ms each; the kernels
                # cast to bf16 anyway)
                if ids_i is not None:
                    ids_i = ids_i.astype(cdt)
                if ef_i is not None:
                    ef_i = ef_i.astype(cdt)

            h = x_interm[i]
            if c.vn:
                pool_seg = (None if (data.pool_recv_local is None
                                     or data.ep_axis is not None)
                            else (data.pool_recv_local, data.pool_fb,
                                  data.pool_block_g, data.pool_counts))
                h = h + broadcast_graph_to_nodes(
                    vn, data.batch, h.shape[0], pool_seg)
                x_interm[i] = h

            x = GSNLayer(
                d_up=c.d_out[i], d_msg=c.d_msg[i], d_h=tuple(c.d_h[i]),
                msg_kind="ogb", id_scope=c.id_scope,
                use_ids=use_ids, use_edge_features=True,
                degree_as_tag=c.degree_as_tag[i],
                retain_features=c.retain_features[i],
                aggr=c.aggr, flow=c.flow,
                activation_mlp=c.activation_mlp, bn_mlp=c.bn_mlp,
                eps=0.0, train_eps=c.train_eps[i],
                id_embedding_kind=c.id_embedding,
                edge_embedding_kind=c.edge_encoder,
                extend_dims=c.extend_dims, axis_name=c.bn_axis_name,
                compute_dtype=c.compute_dtype, ep_axis=data.ep_axis,
                name=f"conv_{i}")(
                    h, data.edge_index, ids_i, degrees, ef_i, nm, em, train,
                    seg=(None if data.seg_recv_local is None
                         else (data.seg_recv_local, data.seg_chunks,
                               data.seg_block_n, data.seg_send_local,
                               data.seg_mode, data.seg_in_degree,
                               data.seg_s_s, data.seg_kc)))

            if c.bn[i]:
                x = MaskedBatchNorm(name=f"bn_{i}",
                                    axis_name=c.bn_axis_name)(
                    x, nm, use_running_average=not train)

            # reference :242-245 — no activation on last conv layer
            # (NodeDropout: per-shard decorrelated under edge
            # partitioning, identical to nn.Dropout otherwise)
            if i == L - 1:
                x = NodeDropout(c.dropout_features[i],
                                ep_axis=data.ep_axis,
                                rng_impl=c.dropout_rng)(
                    x, deterministic=not train)
            else:
                x = NodeDropout(c.dropout_features[i],
                                ep_axis=data.ep_axis,
                                rng_impl=c.dropout_rng)(
                    act(x), deterministic=not train)

            if c.residual:
                x = x + x_interm[-1]
            x_interm.append(x)

            if i < L - 1 and c.vn:
                pooled = _make_pool(c.vn_pooling, data)(
                    x_interm[i], data.batch, num_graphs, nm)
                vn_tmp = pooled.astype(vn.dtype) + vn
                vn = MLP(c.d_out_vn[i], tuple(c.d_h[i]), c.activation_mlp,
                         c.bn_mlp, dtype=cdt, name=f"mlp_vn_{i}")(
                             vn_tmp, data.graph_mask, train)
                vn_post = nn.Dropout(c.dropout_features[i])(
                    act(vn), deterministic=not train)
                vn = vn + vn_post if c.residual else vn_post

        prediction = jnp.zeros_like(x_interm[-1])
        for i, xi in enumerate(x_interm):
            if c.final_projection[i]:
                prediction = prediction + xi
        x_global = pool(prediction, data.batch, num_graphs, nm)
        return nn.Dense(c.out_features, name="lin_proj")(x_global)


class MLPSubstructures(nn.Module):
    """Linear (no message passing) baseline (reference
    models_graph_classification_mlp.py:13-176): one edge-wise MLP over
    cat(x_i, x_j, ids[, e]) pooled per graph over *edges*
    (reference :168 pools with batch[edge_index[0]])."""

    cfg: GSNConfig

    @nn.compact
    def __call__(self, data: GraphBatch, train: bool = False):
        c = self.cfg
        nm, em = data.node_mask, data.edge_mask
        num_graphs = data.num_graph_slots
        pool = _pool_fn(c.readout)

        x = DiscreteEmbedding(
            c.input_node_encoder, c.in_features, c.d_in_node_encoder,
            c.d_out_node_encoder, aggr=c.multi_embedding_aggr,
            activation_mlp=c.activation_mlp, bn_mlp=c.bn_mlp,
            name="input_node_encoder")(data.x, nm, train)

        ids = DiscreteEmbedding(
            c.id_embedding, len(c.d_in_id), c.d_in_id, c.d_out_id_embedding,
            aggr=c.multi_embedding_aggr, activation_mlp=c.activation_mlp,
            bn_mlp=c.bn_mlp, name="id_encoder")(
                data.identifiers,
                em if c.id_scope == "local" else nm, train)

        recv = data.edge_index[0]
        send = data.edge_index[1]
        parts = [x[recv], x[send]]
        if c.id_scope == "local":
            parts.append(ids)
        else:
            parts += [ids[recv], ids[send]]
        if data.edge_features is not None and c.uses_edge_features:
            parts.append(DiscreteEmbedding(
                c.edge_encoder, c.in_edge_features, c.d_in_edge_encoder,
                c.d_out_edge_encoder[0], aggr=c.multi_embedding_aggr,
                activation_mlp=c.activation_mlp, bn_mlp=c.bn_mlp,
                name="edge_encoder")(data.edge_features, em, train))

        h = MLP(c.d_out[0], tuple(c.d_h[0]), c.activation_mlp, c.bn_mlp,
                name="edge_mlp")(jnp.concatenate(parts, -1), em, train)

        edge_batch = data.batch[recv]
        hg = pool(h, edge_batch, num_graphs, em)
        hg = nn.Dropout(c.dropout_features[0])(hg, deterministic=not train)
        return nn.Dense(c.out_features, name="head")(hg)


def build_model(cfg: GSNConfig) -> nn.Module:
    cfg = cfg.finalize()
    if cfg.model_name in {"GSN_edge_sparse_ogb", "MPNN_edge_sparse_ogb"}:
        return GNN_OGB(cfg)
    if cfg.model_name == "MLP":
        return MLPSubstructures(cfg)
    return GNNSubstructures(cfg)
