"""Directional-GSN experiment driver — counterpart of reference
``directional_gsn/main_HIV.py`` (JSON config + CLI overrides, molhiv
train/val pipeline with ReduceLROnPlateau on -val ROC, min-lr stop).

Run: ``python -m gsn_tpu.cli_directional --dataset ogbg-molhiv
--directions subgraphs --id_type cycle_graph --k 6 --id_scope local ...``
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict

import numpy as np

from . import parsing as parse
from .data.directional import assemble_directions
from .data.encoding import encode
from .data.pipeline import prepare_dataset
from .graphs.batching import iterate_batches
from .nn.dgn import DGNConfig, DGNNet, compute_avg_d
from .train.loop import Trainer, TrainerConfig


def build_parser():
    p = argparse.ArgumentParser("gsn_tpu.directional")
    a = p.add_argument
    a("--config", type=str, default=None, help="JSON config file")
    a("--expid", type=str, default="", help="experiment id (tag only)")
    a("--print_epoch_interval", type=int, default=5)
    a("--dataset", type=str, default="ogbg-molhiv")
    a("--data_root", type=str, default="./datasets/ogb")
    a("--cache_folder", type=str, default=None)
    a("--seed", type=int, default=41)
    a("--epochs", type=int, default=200)
    a("--batch_size", type=int, default=128)
    a("--init_lr", type=float, default=0.01)
    a("--lr_reduce_factor", type=float, default=0.5)
    a("--lr_schedule_patience", type=int, default=20)
    a("--min_lr", type=float, default=1e-4)
    a("--weight_decay", type=float, default=3e-6)
    a("--max_time", type=float, default=48.0, help="hours")
    a("--L", type=int, default=4)
    a("--hidden_dim", type=int, default=70)
    a("--out_dim", type=int, default=70)
    a("--type_net", type=str, default="simple")
    a("--residual", type=parse.str2bool, default=True)
    a("--edge_feat", type=parse.str2bool, default=False)
    a("--readout", type=str, default="mean")
    a("--in_feat_dropout", type=float, default=0.0)
    a("--dropout", type=float, default=0.3)
    a("--graph_norm", type=parse.str2bool, default=False)
    a("--batch_norm", type=parse.str2bool, default=True)
    a("--aggregators", type=str, default="mean max min dir1-dx dir1-av")
    a("--scalers", type=str, default="identity")
    a("--posttrans_layers", type=int, default=1)
    a("--pos_enc_dim", type=int, default=0)
    a("--norm", type=str, default="none")
    # substructure directions (reference main_HIV subgraph params)
    a("--directions", type=str, default="subgraphs",
      help="space-separated subset of: eig subgraphs edge_feat")
    a("--id_type", type=str, default="cycle_graph")
    a("--induced", type=parse.str2bool, default=False)
    a("--k", type=parse.str2list2int, default=[6])
    a("--id_scope", type=str, default="local")
    a("--id_encoding", type=str, default="one_hot_unique")
    a("--multiprocessing", type=parse.str2bool, default=True)
    a("--num_processes", type=int, default=8)
    a("--device", type=str, default="default")
    # TPU perf knobs (mirror gsn_tpu.cli; ADVICE r3)
    a("--use_mxu", type=parse.str2bool, default=True,
      help="slab-layout batches: directional aggregators ride the "
           "weighted one-hot MXU kernel (ops/pallas/slab_weighted.py)")
    a("--compute_dtype", type=str, default=None,
      choices=[None, "None", "bfloat16"],
      help="'bfloat16' = bf16 matmuls/activations (f32 BN stats, loss, "
           "readout head)")
    a("--dropout_rng", type=str, default="threefry",
      choices=["threefry", "rbg"])
    # multi-device execution (gsn_tpu.parallel.trainer): the directional
    # model under data-parallel shard_map (cross-replica BN, global
    # loss); grad-exact vs single device (tests/test_dgn_parallel.py)
    a("--parallel", type=str, default="none", choices=["none", "dp"])
    a("--parallel_devices", type=int, default=None,
      help="mesh size (default: all visible devices)")
    return p


def load_config(args: Dict, explicit=None) -> Dict:
    """JSON config file + CLI overrides (reference main_HIV.py:249-357).

    The config file is the *primary* input: its ``params``/``net_params``
    values replace the parser defaults.  CLI flags win only when the user
    explicitly gave them — ``explicit`` is that set of arg names (the
    reference gets the same effect by parsing every flag with a None
    default and copying non-None values over the config).  Programmatic
    callers that pass a plain dict (e.g. the 10-seed scripts) are treated
    as all-explicit unless they supply ``explicit`` themselves.
    """
    if args.get("config") and os.path.exists(args["config"]):
        with open(args["config"]) as f:
            cfg = json.load(f)
        for k, v in {**cfg.get("params", {}),
                     **cfg.get("net_params", {})}.items():
            if k not in args:
                continue
            if (explicit is None and args[k] is not None) or \
                    (explicit is not None and k in explicit):
                continue  # CLI override wins
            args[k] = v
    return args


def _explicit_flags(parser: argparse.ArgumentParser, argv=None):
    """Names of flags the user actually typed, via a SUPPRESS-default
    shadow parser (so parser defaults never appear in the namespace)."""
    shadow = argparse.ArgumentParser(add_help=False)
    for act in parser._actions:
        if act.dest == "help":
            continue
        shadow.add_argument(*act.option_strings, dest=act.dest,
                            type=act.type, nargs=act.nargs,
                            default=argparse.SUPPRESS)
    ns, _ = shadow.parse_known_args(argv)
    return set(vars(ns).keys())


def main(args: Dict, explicit=None):
    import jax
    if args.get("device") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:
        os.makedirs("/root/repo/.jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    args = load_config(args, explicit)
    np.random.seed(args["seed"])

    path = os.path.join(args["data_root"], args["dataset"])
    graphs, num_tasks, _sizes = prepare_dataset(
        path, "ogb", args["dataset"], id_scope=args["id_scope"],
        id_type=args["id_type"], k=args["k"], induced=args["induced"],
        num_processes=(args["num_processes"]
                       if args["multiprocessing"] else 1),
        cache_root=args.get("cache_folder"))
    graphs, _eid, d_id, _ed, _dd = encode(
        graphs, args["id_encoding"] if args["id_encoding"] != "None"
        else None)
    # ogb scaffold split from the bundled index files, then per-split
    # direction assembly + n<=5 filtering (reference HIVDGL order:
    # HIV.py:54-109 filters after splitting)
    directions = args["directions"].split()

    def prep_split(idx):
        subset = [graphs[i] for i in idx]
        return assemble_directions(
            subset, directions=directions, id_scope=args["id_scope"],
            pos_enc_dim=args["pos_enc_dim"], norm=args["norm"])

    split_dir = os.path.join(path, "10fold_idx")
    train = prep_split(np.loadtxt(
        os.path.join(split_dir, "train_idx-1.txt"), dtype=int))
    test = prep_split(np.loadtxt(
        os.path.join(split_dir, "test_idx-1.txt"), dtype=int))
    val = prep_split(np.loadtxt(
        os.path.join(split_dir, "val_idx-1.txt"), dtype=int))

    avg_d = compute_avg_d(train)
    par = args.get("parallel", "none") or "none"
    cfg = DGNConfig(
        bn_axis_name=("dp" if par == "dp" else None),
        hidden_dim=args["hidden_dim"], out_dim=args["out_dim"],
        num_layers=args["L"], aggregators=tuple(args["aggregators"].split()),
        scalers=tuple(args["scalers"].split()), avg_d=avg_d,
        readout=args["readout"], residual=args["residual"],
        edge_feat=args["edge_feat"],
        in_feat_dropout=args["in_feat_dropout"], dropout=args["dropout"],
        graph_norm=args["graph_norm"], batch_norm=args["batch_norm"],
        pos_enc_dim=args["pos_enc_dim"],
        posttrans_layers=args["posttrans_layers"], out_features=num_tasks,
        compute_dtype=(None if args.get("compute_dtype") in (None, "None")
                       else args["compute_dtype"]),
        dropout_rng=args.get("dropout_rng", "threefry"))
    model = DGNNet(cfg)

    tcfg = TrainerConfig(
        lr=args["init_lr"], regularization=args["weight_decay"],
        scheduler="ReduceLROnPlateau",
        decay_rate=args["lr_reduce_factor"],
        patience=args["lr_schedule_patience"], min_lr=args["min_lr"],
        batch_size=args["batch_size"], num_epochs=args["epochs"],
        loss_fn="BCEWithLogitsLoss", prediction_fn="None",
        evaluator="rocauc", seed=args["seed"], caps_mode="worst",
        use_mxu_segment_sum=bool(args.get("use_mxu", True)))

    if par == "dp":
        from .parallel.mesh import make_mesh
        from .parallel.trainer import ParallelTrainer
        mesh = make_mesh(args.get("parallel_devices"),
                         axis_names=("dp",))
        trainer = ParallelTrainer(cfg, tcfg, train, mesh=mesh, mode="dp",
                                  model=model)
    else:
        trainer = Trainer(cfg, tcfg, train, model=model)
    example = next(iterate_batches(train, tcfg.batch_size,
                                   y_shape=trainer.y_shape,
                                   y_dtype=trainer.y_dtype))
    state = trainer.init_state(example, seed=args["seed"])

    import time as _time
    t_start = _time.time()
    best_val, best = -1.0, None
    for epoch in range(args["epochs"]):
        state, train_loss = trainer.train_epoch(state, train)
        val_loss, val_roc = trainer.evaluate(state, val)
        test_loss, test_roc = trainer.evaluate(state, test)
        # scheduler steps on -val ROC (reference main_HIV.py:148)
        trainer.scheduler.step(-val_roc)
        if val_roc > best_val:
            best_val, best = val_roc, (epoch, val_roc, test_roc)
        interval = max(1, int(args.get("print_epoch_interval") or 1))
        if epoch % interval == 0 or epoch == args["epochs"] - 1:
            print(f"epoch {epoch:03d} loss {train_loss:.4f} "
                  f"val ROC {val_roc:.4f} test ROC {test_roc:.4f} "
                  f"lr {trainer.scheduler.lr:.6f}")
        if trainer.scheduler.lr < args["min_lr"]:
            print("lr below min_lr, stopping")
            break
        if _time.time() - t_start > args["max_time"] * 3600:
            print("max_time reached, stopping")
            break
    if best is None:
        print("no epochs ran (epochs=0)")
        return None
    print(f"best-val epoch {best[0]}: val {best[1]:.4f} test {best[2]:.4f}")
    return best


def cli():
    parser = build_parser()
    main(vars(parser.parse_args()), explicit=_explicit_flags(parser))


if __name__ == "__main__":
    cli()
