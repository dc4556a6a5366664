"""Directional Graph Network (DGN) layer + model — TPU-native rebuild of
the reference ``directional_gsn/nets/*``.

The reference aggregates with DGL's dense padded mailboxes
(``dgn_layer.py:42-53``); here every aggregator is re-derived as masked
*segment* ops over the edge list (SURVEY §7: "all expressible as segment
ops; no padding mailbox needed"), which keeps shapes static and lets XLA
fuse the directional weightings into the gathers.

Aggregator math (``aggregators.py:8-71``), with vf = per-edge vector
field and N(v) = in-neighborhood:
- mean/sum/max/min/var/std: standard masked segment reductions;
- dir-av:   out_v = sum_e w_e h_src(e),  w_e = |vf_e| / (sum|vf|+EPS);
- dir-dx:   out_v = |sum_e u_e h_src(e) - (sum_e u_e) h_v|,
            u_e = vf_e / (sum|vf|+EPS)  (discrete derivative);
- dir-dx-no-abs / dir-dx-balanced, dir-softmax: same pattern with signed
  / softmaxed weights.

Scalers (``scalers.py``) are PNA log-degree scalings using train-set
averages avg_d; D is the per-node in-degree.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gsn_tpu.graphs.container import GraphBatch
from gsn_tpu.ops.norm import MaskedBatchNorm
from gsn_tpu.ops.segment import (masked_segment_max, masked_segment_mean,
                                 masked_segment_sum)
from .embedding import DiscreteEmbedding

EPS = 1e-8


# ---------------------------------------------------------------------------
# aggregators as segment ops
# ---------------------------------------------------------------------------

def _segment_min(h, dst, n, mask):
    return -masked_segment_max(-h, dst, n, mask)


def _dir_weights(vf_col, dst, n, mask, signed: bool):
    """w_e = vf_e / (sum_{e into dst} |vf_e| + EPS); |.| if not signed."""
    denom = masked_segment_sum(jnp.abs(vf_col), dst, n, mask)
    num = vf_col if signed else jnp.abs(vf_col)
    return num / (denom[dst] + EPS)


def dgn_aggregate(
    name: str,
    h_src: jnp.ndarray,        # [E, d] gathered source features
    vf: Optional[jnp.ndarray],  # [E, Dv] per-edge vector field
    h_in: jnp.ndarray,         # [N, d]
    dst: jnp.ndarray,          # [E]
    num_nodes: int,
    edge_mask: jnp.ndarray,
) -> jnp.ndarray:
    if name == "mean":
        return masked_segment_mean(h_src, dst, num_nodes, edge_mask)
    if name == "sum":
        return masked_segment_sum(h_src, dst, num_nodes, edge_mask)
    if name == "max":
        return masked_segment_max(h_src, dst, num_nodes, edge_mask)
    if name == "min":
        return _segment_min(h_src, dst, num_nodes, edge_mask)
    if name == "var" or name == "std":
        m2 = masked_segment_mean(h_src * h_src, dst, num_nodes, edge_mask)
        m = masked_segment_mean(h_src, dst, num_nodes, edge_mask)
        var = nn.relu(m2 - m * m)
        return jnp.sqrt(var + EPS) if name == "std" else var

    if name.startswith("dir"):
        # 'dir{i}-av' | 'dir{i}-dx' | 'dir{i}-dx-no-abs' |
        # 'dir{i}-dx-balanced' | 'dir{i}-{alpha}' (softmax)
        parts = name.split("-", 1)
        eig_idx = int(parts[0][3:])
        kind = parts[1]
        col = vf[:, eig_idx]
        if kind == "av":
            w = _dir_weights(col, dst, num_nodes, edge_mask, signed=False)
            w = jnp.where(edge_mask, w, 0.0)
            return masked_segment_sum(h_src * w[:, None], dst, num_nodes,
                                      edge_mask)
        if kind in ("dx", "dx-no-abs"):
            u = _dir_weights(col, dst, num_nodes, edge_mask, signed=True)
            u = jnp.where(edge_mask, u, 0.0)
            agg = masked_segment_sum(h_src * u[:, None], dst, num_nodes,
                                     edge_mask)
            u_sum = masked_segment_sum(u, dst, num_nodes, edge_mask)
            out = agg - u_sum[:, None] * h_in
            return jnp.abs(out) if kind == "dx" else out
        if kind == "dx-balanced":
            front = nn.relu(col)
            back = nn.relu(-col)
            df = masked_segment_sum(jnp.abs(front), dst, num_nodes,
                                    edge_mask)
            db = masked_segment_sum(jnp.abs(back), dst, num_nodes,
                                    edge_mask)
            u = (front / (df[dst] + EPS) + back / (db[dst] + EPS)) / 2.0
            u = jnp.where(edge_mask, u, 0.0)
            agg = masked_segment_sum(h_src * u[:, None], dst, num_nodes,
                                     edge_mask)
            u_sum = masked_segment_sum(u, dst, num_nodes, edge_mask)
            return jnp.abs(agg - u_sum[:, None] * h_in)
        # softmax aggregators: 'dir{i}-0.1' / 'dir{i}-neg-0.1'
        alpha_str = kind
        neg = alpha_str.startswith("neg-")
        alpha = float(alpha_str[4:]) if neg else float(alpha_str)
        if neg:
            alpha = -alpha
        logits = alpha * jnp.abs(col)
        seg_max = masked_segment_max(logits, dst, num_nodes, edge_mask)
        ex = jnp.where(edge_mask, jnp.exp(logits - seg_max[dst]), 0.0)
        denom = masked_segment_sum(ex, dst, num_nodes, edge_mask)
        w = ex / (denom[dst] + EPS)
        return masked_segment_sum(h_src * w[:, None], dst, num_nodes,
                                  edge_mask)

    raise NotImplementedError(f"aggregator {name!r}")


def softmax_weight(name: str, vf, dst, num_nodes, edge_mask):
    """Per-edge weight of a 'dir{i}-{alpha}' softmax aggregator (needs a
    scalar segment max, so it stays off the batched node-sum pass).
    Math identical to ``dgn_aggregate``."""
    parts = name.split("-", 1)
    eig_idx = int(parts[0][3:])
    alpha_str = parts[1]
    neg = alpha_str.startswith("neg-")
    alpha = float(alpha_str[4:]) if neg else float(alpha_str)
    if neg:
        alpha = -alpha
    logits = alpha * jnp.abs(vf[:, eig_idx])
    seg_max = masked_segment_max(logits, dst, num_nodes, edge_mask)
    ex = jnp.where(edge_mask, jnp.exp(logits - seg_max[dst]), 0.0)
    denom = masked_segment_sum(ex, dst, num_nodes, edge_mask)
    return ex / (denom[dst] + EPS)


def _node_sums_via_slab(cols, data: GraphBatch, n: int):
    """ONE slab-kernel pass summing K' per-edge scalar columns to nodes.

    XLA's scalar [E]->[N] scatter fusions measured ~0.65 ms EACH on the
    molhiv shape (~0.6 GB/s); the dir-weight denominators need ~5 of
    them.  Batched through the slab kernel (A=0, B=0, Pe=columns,
    identity act) they cost one small kernel launch."""
    import jax as _jax

    from gsn_tpu.ops.pallas.slab_message import (
        S_S, slab_edge_message_aggregate)
    K = len(cols)
    Pe = jnp.stack(cols, axis=1)
    block_n = data.seg_block_n
    block_e = data.seg_recv_local.shape[0] // data.seg_chunks.shape[1]
    padded = max(-(-n // block_n), S_S) * block_n
    zero = jnp.zeros((n, K), jnp.float32)
    out = slab_edge_message_aggregate(
        zero, zero, Pe, jnp.zeros((K,), jnp.float32),
        data.seg_recv_local, data.seg_send_local, data.seg_chunks, n,
        padded, block_n, block_e, "identity", True,
        _jax.default_backend() == "cpu", None, "float32", False,
        data.seg_s_s if data.seg_s_s is not None else S_S,
        data.seg_kc if data.seg_kc is not None else (None, None))
    return out[:n]


def build_agg_ctx(aggregators, data: GraphBatch, n: int) -> Dict:
    """Layer-invariant aggregation context: the per-edge vector field,
    in-degrees, and — when the batch carries slab metadata — the stacked
    weight columns W [E, K] + post fns for every aggregator expressible
    as a weighted sum (one weighted-kernel pass per layer; var/std keep
    the segment path; max/min ride slab_segment_minmax inside the
    layer).  Outputs re-assemble in configured aggregator order so
    numerics match the reference concat layout (dgn_layer.py:42-53).

    All scalar node-sum denominators (degree, Σ|vf_i|, Σvf_i, ...) are
    batched into ONE kernel pass (`_node_sums_via_slab`)."""
    src = data.edge_index[0]
    dst = data.edge_index[1]
    em = data.edge_mask
    emf = em.astype(jnp.float32)
    vf_parts = []
    if data.node_eig is not None:
        vf_parts.append(data.node_eig[src] - data.node_eig[dst])
    if data.edge_eig is not None:
        vf_parts.append(data.edge_eig)
    vf = jnp.concatenate(vf_parts, axis=1) if vf_parts else None

    seg_ok = (data.seg_recv_local is not None
              and data.seg_mode == "slab" and data.ep_axis is None)
    if not seg_ok:
        deg = masked_segment_sum(jnp.ones_like(dst, jnp.float32), dst,
                                 n, em)
        return {"vf": vf, "deg": deg, "kernel_idx": [], "W": None,
                "posts": [], "seg_ok": False}

    # ---- phase 1: collect every scalar column that needs a node sum
    cols = [emf]                      # degree
    plans = []                        # (kind, eig_idx, col slot(s))
    ident = lambda agg, h_in: agg     # noqa: E731

    def _alloc(*cs):
        i0 = len(cols)
        cols.extend(cs)
        return list(range(i0, i0 + len(cs)))

    for a in aggregators:
        if a == "sum":
            plans.append(("sum", None, None))
        elif a == "mean":
            plans.append(("mean", None, None))
        elif a.startswith("dir"):
            head, kind = a.split("-", 1)
            ei = int(head[3:])
            col = vf[:, ei]
            if kind == "av":
                plans.append(("av", ei, _alloc(jnp.abs(col) * emf)))
            elif kind in ("dx", "dx-no-abs"):
                plans.append((kind, ei,
                              _alloc(jnp.abs(col) * emf, col * emf)))
            elif kind == "dx-balanced":
                plans.append((kind, ei,
                              _alloc(nn.relu(col) * emf,
                                     nn.relu(-col) * emf)))
            else:
                plans.append(("softmax", ei, None))   # segment path w
        else:
            plans.append((None, None, None))   # max/min/var/std

    sums = _node_sums_via_slab(cols, data, n)
    deg = sums[:, 0]
    inv_deg = 1.0 / jnp.maximum(deg, 1.0)
    # ONE [E]-gather of every per-node quantity the weights need (per-
    # column gathers were ~0.5 ms each on the molhiv shape)
    sums_e = jnp.concatenate([sums, inv_deg[:, None]], axis=1)[dst]

    # ---- phase 2: weights + posts from the node sums
    kernel_idx, kernel_w, posts = [], [], []
    for i, (a, (kind, ei, slots)) in enumerate(zip(aggregators, plans)):
        if kind is None:
            continue
        if kind == "sum":
            w, post = emf, ident
        elif kind == "mean":
            w, post = sums_e[:, -1] * emf, ident
        elif kind == "av":
            w = jnp.abs(vf[:, ei]) / (sums_e[:, slots[0]] + EPS) * emf
            post = ident
        elif kind in ("dx", "dx-no-abs"):
            denom = sums[:, slots[0]]
            w = vf[:, ei] / (sums_e[:, slots[0]] + EPS) * emf
            u_sum = sums[:, slots[1]] / (denom + EPS)

            def post(agg, h_in, u_sum=u_sum, absa=(kind != "dx-no-abs")):
                out = agg - u_sum[:agg.shape[0], None] * h_in
                return jnp.abs(out) if absa else out
        elif kind == "dx-balanced":
            df, db = sums[:, slots[0]], sums[:, slots[1]]
            col = vf[:, ei]
            w = (nn.relu(col) / (sums_e[:, slots[0]] + EPS)
                 + nn.relu(-col) / (sums_e[:, slots[1]] + EPS)) \
                / 2.0 * emf
            u_sum = (df / (df + EPS) + db / (db + EPS)) / 2.0

            def post(agg, h_in, u_sum=u_sum):
                return jnp.abs(agg - u_sum[:agg.shape[0], None] * h_in)
        else:   # softmax: w needs a scalar segment max — segment path
            w, post = softmax_weight(a, vf, dst, n, em), ident
        kernel_idx.append(i)
        kernel_w.append(w)
        posts.append(post)
    return {"vf": vf, "deg": deg, "kernel_idx": kernel_idx,
            "W": jnp.stack(kernel_w, axis=1) if kernel_idx else None,
            "posts": posts, "seg_ok": True}


def dgn_scale(name: str, h: jnp.ndarray, deg: jnp.ndarray,
              avg_d: Dict[str, float]) -> jnp.ndarray:
    """PNA degree scalers (reference scalers.py); deg = in-degree [N]."""
    if name == "identity":
        return h
    logd = jnp.log(deg + 1.0)
    if name == "amplification":
        return h * (logd / avg_d["log"])[:, None]
    if name == "attenuation":
        return h * (avg_d["log"] / jnp.maximum(logd, EPS))[:, None]
    raise NotImplementedError(f"scaler {name!r}")


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------

class DGNMlp(nn.Module):
    """FC stack: linear -> relu between layers, none after last
    (reference layers.py MLP with mid_activation relu)."""

    hidden: int
    out: int
    layers: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                                 name=f"fc_{i}")(x))
        return nn.Dense(self.out, dtype=self.dtype,
                        name=f"fc_{self.layers - 1}")(x)


class DGNLayerSimple(nn.Module):
    """reference dgn_layer.py:11-82 ('simple' type — the only runnable
    variant; 'complex'/'towers' reference missing classes, SURVEY §2 #26).

    vector_field per edge = (eig_src - eig_dst) for node-level fields,
    concat edge-level fields (pretrans_edges, :30-37)."""

    out_dim: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    avg_d: Dict[str, float]
    dropout: float = 0.0
    graph_norm: bool = False
    batch_norm: bool = True
    residual: bool = True
    posttrans_layers: int = 1
    dtype: Optional[jnp.dtype] = None   # compute dtype (bf16 matmuls)
    dropout_rng: str = "threefry"
    bn_axis_name: Optional[str] = None  # cross-replica BN stats under
    #                                     data-parallel shard_map

    @nn.compact
    def __call__(self, h, data: GraphBatch, snorm_n=None, train=False,
                 agg_ctx=None):
        src = data.edge_index[0]
        dst = data.edge_index[1]
        em, nm = data.edge_mask, data.node_mask
        n = h.shape[0]

        # the vector field, degrees and all per-edge aggregator weights
        # are LAYER-INVARIANT — DGNNet computes them once and passes the
        # context down (the recomputed scalar segment ops were a
        # measured ~10% of the r4 step); standalone layer calls build it
        # locally
        if agg_ctx is None:
            agg_ctx = build_agg_ctx(self.aggregators, data, n)
        vf, deg = agg_ctx["vf"], agg_ctx["deg"]

        h_in = h
        parts = [None] * len(self.aggregators)
        kernel_idx = agg_ctx["kernel_idx"]
        mm_idx = ([i for i, a in enumerate(self.aggregators)
                   if a in ("max", "min")]
                  if agg_ctx["seg_ok"] else [])
        if kernel_idx or mm_idx:
            from gsn_tpu.ops.pallas.slab_weighted import (
                S_S, slab_dgn_fused, slab_weighted_gather)
            block_n = data.seg_block_n
            block_e = (data.seg_recv_local.shape[0]
                       // data.seg_chunks.shape[1])
            padded = max(-(-n // block_n), S_S) * block_n
            s_s = data.seg_s_s if data.seg_s_s is not None else S_S
            kc = (data.seg_kc if data.seg_kc is not None
                  else (None, None))
            interp = jax.default_backend() == "cpu"
            bf16 = self.dtype == jnp.bfloat16
            ddt = "bfloat16" if bf16 else "float32"
            hk = h.astype(jnp.bfloat16 if bf16 else jnp.float32)
            d = h.shape[1]
            meta = (data.seg_recv_local, data.seg_send_local,
                    data.seg_chunks, n, padded, block_n, block_e)
            mm = out = None
            if kernel_idx and mm_idx:
                # weighted sums + max/min share one fused launch (the
                # separate launches re-did the one-hot/gather work)
                out, mm = slab_dgn_fused(hk, agg_ctx["W"], *meta,
                                         interp, s_s, ddt, kc)
            elif kernel_idx:
                out = slab_weighted_gather(hk, agg_ctx["W"], *meta,
                                           interp, s_s, ddt, kc)
            else:
                from gsn_tpu.ops.pallas.slab_minmax import \
                    slab_segment_minmax
                mm = slab_segment_minmax(hk, *meta, interp, s_s, ddt)
            for j, i in enumerate(kernel_idx):
                parts[i] = agg_ctx["posts"][j](
                    out[:n, j * d:(j + 1) * d], h_in)
            for i in mm_idx:
                parts[i] = (mm[:n, :d]
                            if self.aggregators[i] == "max"
                            else -mm[:n, d:])
        h_src = None
        for i, a in enumerate(self.aggregators):
            if parts[i] is None:
                if h_src is None:
                    # f32 gather: the XLA fallback's segment sums (and
                    # especially var/std's E[h^2]-E[h]^2 cancellation)
                    # must not accumulate in bf16
                    h_src = h.astype(jnp.float32)[src]
                parts[i] = dgn_aggregate(a, h_src, vf, h_in, dst, n, em)
        agg = jnp.concatenate(parts, axis=1)
        if len(self.scalers) > 1:
            agg = jnp.concatenate(
                [dgn_scale(s, agg, deg, self.avg_d) for s in self.scalers],
                axis=1)

        h = DGNMlp(self.out_dim, self.out_dim, self.posttrans_layers,
                   dtype=self.dtype, name="posttrans")(agg)
        if self.graph_norm:
            h = h * (snorm_n.astype(h.dtype) if self.dtype else snorm_n)
        if self.batch_norm:
            # f32 statistics, output in h's dtype (ops/norm.py);
            # axis_name psums the masked moments across data-parallel
            # replicas so DP numerics match single-device whole-batch BN
            h = MaskedBatchNorm(name="bn", axis_name=self.bn_axis_name)(
                h, nm, use_running_average=not train)
        h = nn.relu(h)
        if self.residual and h_in.shape[-1] == self.out_dim:
            h = h_in.astype(h.dtype) + h
        from .models import NodeDropout
        h = NodeDropout(self.dropout, ep_axis=None,
                        rng_impl=self.dropout_rng)(
            h, deterministic=not train)
        return h


@dataclasses.dataclass
class DGNConfig:
    hidden_dim: int = 70
    out_dim: int = 70
    num_layers: int = 4
    aggregators: Tuple[str, ...] = ("mean", "max", "min",
                                    "dir0-av", "dir1-av", "dir2-av",
                                    "dir3-av")
    scalers: Tuple[str, ...] = ("identity",)
    avg_d: Optional[Dict[str, float]] = None
    readout: str = "mean"
    residual: bool = True
    edge_feat: bool = False
    edge_dim: int = 0
    in_feat_dropout: float = 0.0
    dropout: float = 0.3
    graph_norm: bool = False
    batch_norm: bool = True
    pos_enc_dim: int = 0
    posttrans_layers: int = 1
    out_features: int = 1
    compute_dtype: Optional[str] = None   # 'bfloat16': bf16 matmuls +
    #                                       bf16 activations (f32 BN
    #                                       stats / loss / readout head)
    dropout_rng: str = "threefry"         # 'rbg': hardware bit generator
    bn_axis_name: Optional[str] = None    # set under data-parallel
    #                                       shard_map (parallel/trainer.py)


class DGNNet(nn.Module):
    """reference dgn_net.py:8-85: AtomEncoder input, L stacked DGN-simple
    layers, sum/max/mean readout, halving-width MLPReadout head."""

    cfg: DGNConfig

    @nn.compact
    def __call__(self, data: GraphBatch, train: bool = False):
        c = self.cfg
        nm = data.node_mask
        num_graphs = data.num_graph_slots

        cdt = jnp.dtype(c.compute_dtype) if c.compute_dtype else None

        h = DiscreteEmbedding("atom_encoder", data.x.shape[1], None,
                              c.hidden_dim, name="embedding_h")(
                                  data.x, nm, train)
        h = nn.Dropout(c.in_feat_dropout)(h, deterministic=not train)
        if c.pos_enc_dim > 0 and data.node_eig is not None:
            pos = data.node_eig[:, 1:c.pos_enc_dim + 1]
            h = h + nn.Dense(c.hidden_dim, name="embedding_pos_enc")(pos)
        if cdt:
            # activations travel bf16 between layers (BN stats, the
            # aggregator weights and the readout head stay f32)
            h = h.astype(cdt)

        # snorm_n = sqrt(1/n_g) per node (reference HIV.py collate :176-178)
        sizes = masked_segment_sum(nm.astype(jnp.float32), data.batch,
                                   num_graphs, nm)
        snorm = jnp.sqrt(1.0 / jnp.maximum(sizes, 1.0))[data.batch][:, None]

        avg_d = c.avg_d or {"log": 1.0}
        # vector field + aggregator weights are layer-invariant: one
        # context shared by all layers
        agg_ctx = build_agg_ctx(tuple(c.aggregators), data, h.shape[0])
        for i in range(c.num_layers):
            out_dim = c.out_dim if i == c.num_layers - 1 else c.hidden_dim
            h = DGNLayerSimple(
                out_dim=out_dim, aggregators=tuple(c.aggregators),
                scalers=tuple(c.scalers), avg_d=avg_d, dropout=c.dropout,
                graph_norm=c.graph_norm, batch_norm=c.batch_norm,
                residual=c.residual, posttrans_layers=c.posttrans_layers,
                dtype=cdt, dropout_rng=c.dropout_rng,
                bn_axis_name=c.bn_axis_name,
                name=f"layer_{i}")(h, data, snorm, train,
                                   agg_ctx=agg_ctx)

        if cdt:
            h = h.astype(jnp.float32)   # f32 readout reductions + head
        if c.readout == "sum":
            hg = masked_segment_sum(h, data.batch, num_graphs, nm)
        elif c.readout == "max":
            hg = masked_segment_max(h, data.batch, num_graphs, nm)
        else:
            hg = masked_segment_mean(h, data.batch, num_graphs, nm)

        # MLPReadout: halving widths, L=2 (reference mlp_readout_layer.py)
        y = hg
        d = c.out_dim
        for l in range(2):
            y = nn.relu(nn.Dense(d // 2 ** (l + 1),
                                 name=f"readout_fc_{l}")(y))
        return nn.Dense(c.out_features, name="readout_fc_2")(y)


def compute_avg_d(graphs: List[Dict]) -> Dict[str, float]:
    """Train-set degree statistics (reference main_HIV.py:359-363)."""
    import numpy as np
    degs = []
    for g in graphs:
        n = g["x"].shape[0]
        d = np.zeros(n)
        if g["edge_index"].size:
            np.add.at(d, g["edge_index"][1], 1.0)
        degs.append(d)
    D = np.concatenate(degs)
    return {
        "lin": float(np.mean(D)),
        "exp": float(np.mean(np.exp(1.0 / np.maximum(D, 1e-30)) - 1.0)),
        "log": float(np.mean(np.log(D + 1.0))),
    }
