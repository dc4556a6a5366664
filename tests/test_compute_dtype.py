"""compute_dtype='bfloat16' through the slab kernel path.

The bf16 mode must (a) actually run — every msg kind, fwd + bwd, on the
slab layout — and (b) stay numerically close to f32: data is rounded to
bf16 (single-pass one-hot MXU dots, see ops/pallas/onehot_dot.py) but
every aggregation still accumulates in f32.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsn_tpu.config import GSNConfig
from gsn_tpu.graphs.batching import iterate_batches, tight_epoch_caps
from gsn_tpu.train.loop import Trainer, TrainerConfig

SLAB = {"mode": "slab", "flow": "source_to_target",
        "block_n": 128, "block_e": 256}


def _setup(num_graphs=48, seed=0):
    from bench import make_zinc_like
    graphs, d_id = make_zinc_like(num_graphs, seed=seed)
    caps = tight_epoch_caps(np.arange(len(graphs)), graphs, num_graphs)
    data = next(iterate_batches(graphs, num_graphs, caps=caps,
                                y_shape=(), y_dtype=np.float32,
                                mxu_layout=SLAB))
    assert data.seg_recv_local is not None, "slab layout must build"
    return graphs, d_id, data


def _cfg(d_id, **kw):
    base = dict(
        model_name="GSN_edge_sparse", num_layers=2, d_out=32,
        out_features=1, msg_kind="general", id_scope="global",
        bn_mlp=False, id_embedding="one_hot_encoder",
        input_node_encoder="embedding", edge_encoder="embedding",
        readout="sum", in_features=1, d_in_node_encoder=[28],
        d_in_edge_encoder=[4], d_in_id=d_id)
    base.update(kw)
    return GSNConfig(**base)


TCFG = TrainerConfig(lr=1e-3, batch_size=48, scheduler="None",
                     loss_fn="L1Loss", prediction_fn="L1Loss",
                     shuffle=False)


@pytest.mark.parametrize("kind,extra", [
    ("general", {}),
    ("gin", {}),
    ("ogb", {"model_name": "GSN_edge_sparse_ogb", "vn": True,
             "readout": "mean", "final_projection": [False],
             "id_embedding": "embedding", "d_out_id_embedding": 32,
             "d_h": 64}),
])
def test_bf16_close_to_f32_on_slab_path(kind, extra):
    graphs, d_id, data = _setup()
    key = jax.random.PRNGKey(0)
    losses = {}
    grads = {}
    for dt in (None, "bfloat16"):
        cfg = _cfg(d_id, msg_kind=kind, compute_dtype=dt, **extra)
        tr = Trainer(cfg, TCFG, graphs)
        st = tr.init_state(data, seed=0)

        def loss_of(params):
            y, _ = tr._apply(params, st.batch_stats, data, False, None)
            return tr.loss_fn(y, data.y, data.graph_mask)

        losses[dt] = float(loss_of(st.params))
        g = jax.grad(loss_of)(st.params)
        grads[dt] = np.concatenate(
            [np.asarray(l, np.float32).ravel()
             for l in jax.tree_util.tree_leaves(g)])
    # forward: bf16 rounding error only (layers re-materialize f32)
    assert losses["bfloat16"] == pytest.approx(losses[None],
                                               rel=2e-2, abs=2e-2)
    # gradients: direction must agree (cosine), magnitudes bf16-close
    a, b = grads[None], grads["bfloat16"]
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
    assert cos > 0.99, cos


def test_bf16_kernel_dots_are_single_pass():
    """onehot_dot dispatches on dtype: bf16 data -> one dot in the jaxpr,
    f32 data -> three."""
    from gsn_tpu.ops.pallas.onehot_dot import onehot_dot
    sel = jnp.zeros((8, 16), jnp.float32)
    for dt, n_expected in ((jnp.float32, 3), (jnp.bfloat16, 1)):
        x = jnp.zeros((16, 4), dt)
        jaxpr = jax.make_jaxpr(onehot_dot)(sel, x)
        n_dots = sum(1 for e in jaxpr.jaxpr.eqns
                     if e.primitive.name == "dot_general")
        assert n_dots == n_expected, (dt, jaxpr)
