"""Experiment driver CLI — the TPU-native counterpart of reference
``main.py`` (flag surface at main.py:501-680; modes at :160-367).

Three modes over one split or 10-fold CV:
- ``isomorphism_test``: random-weight embedding disambiguation (SR);
- ``train``: full training with periodic eval + checkpointing;
- ``test``: evaluate a saved checkpoint.

Run: ``python -m gsn_tpu.cli --dataset SR_graphs --dataset_name sr251256
--mode isomorphism_test ...`` with the same flags as the reference.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List

import numpy as np

from . import parsing as parse
from .config import GSNConfig
from .data.encoding import encode
from .data.pipeline import prepare_dataset
from .data.splits import separate_data, separate_data_given_split
from .graphs.batching import iterate_batches
from .train.checkpoint import load_checkpoint
from .train.isomorphism import run_isomorphism_test
from .train.logging import RunLogger
from .train.loop import Trainer, TrainerConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("gsn_tpu")
    a = p.add_argument
    # seeds / splits (main.py:506-520)
    a("--seed", type=int, default=0)
    a("--split_seed", type=int, default=0)
    a("--np_seed", type=int, default=0)
    a("--fold_idx", type=parse.str2list2int,
      default=[0, 1, 2, 3, 4, 5, 6, 7, 8, 9])
    a("--onesplit", type=parse.str2bool, default=False)
    a("--multiprocessing", type=parse.str2bool, default=False)
    a("--num_processes", type=int, default=8)
    # loader knobs (reference main.py:519-520): accepted for
    # compatibility; batching here is host-side numpy, no worker pool
    a("--num_workers", type=int, default=0)
    a("--num_threads", type=int, default=1)
    # dataset (main.py:525-528)
    a("--dataset", type=str, default="bioinformatics")
    a("--dataset_name", type=str, default="MUTAG")
    a("--split", type=str, default="given")
    a("--root_folder", type=str, default="./datasets")
    a("--cache_folder", type=str, default=None)
    # features (main.py:532-544)
    a("--degree_as_tag", type=parse.str2bool, default=False)
    a("--retain_features", type=parse.str2bool, default=False)
    a("--features_scope", type=str, default="full")
    a("--vn", type=parse.str2bool, default=False)
    a("--vn_pooling", type=str, default="sum")
    a("--input_vn_encoder", type=str, default="one_hot_encoder")
    a("--d_out_vn_encoder", type=int, default=None)
    a("--d_out_vn", type=int, default=None)
    # substructures (main.py:552-559)
    a("--id_type", type=str, default="cycle_graph")
    a("--induced", type=parse.str2bool, default=False)
    a("--edge_automorphism", type=str, default="induced")
    a("--k", type=parse.str2list2int, default=[3])
    a("--id_scope", type=str, default="local")
    a("--custom_edge_list", type=parse.str2ListOfListsOfLists2int,
      default=None)
    a("--directed", type=parse.str2bool, default=False)
    a("--directed_orbits", type=parse.str2bool, default=False)
    # encodings (main.py:563-584)
    a("--id_encoding", type=str, default="one_hot_unique")
    a("--degree_encoding", type=str, default="one_hot_unique")
    # binning-encoder knobs (reference main.py:568-573): accepted for
    # command-line compatibility but inert — the binning encoders are
    # commented out in the reference too (utils_encoding.py:73-140)
    a("--id_bins", type=parse.str2list2int, default=None)
    a("--degree_bins", type=parse.str2list2int, default=None)
    a("--id_strategy", type=str, default="uniform")
    a("--degree_strategy", type=str, default="uniform")
    a("--id_range", type=parse.str2list2int, default=None)
    a("--degree_range", type=parse.str2list2int, default=None)
    a("--id_embedding", type=str, default="one_hot_encoder")
    a("--d_out_id_embedding", type=int, default=None)
    a("--degree_embedding", type=str, default="one_hot_encoder")
    a("--d_out_degree_embedding", type=int, default=None)
    a("--input_node_encoder", type=str, default="None")
    a("--d_out_node_encoder", type=int, default=None)
    a("--edge_encoder", type=str, default="None")
    a("--d_out_edge_encoder", type=int, default=None)
    a("--multi_embedding_aggr", type=str, default="sum")
    a("--extend_dims", type=parse.str2bool, default=True)
    # model (main.py:602-635)
    a("--model_name", type=str, default="GSN_sparse")
    a("--random_features", type=parse.str2bool, default=False)
    a("--num_mlp_layers", type=int, default=2)
    a("--d_h", type=int, default=None)
    a("--activation_mlp", type=str, default="relu")
    a("--bn_mlp", type=parse.str2bool, default=True)
    a("--num_layers", type=int, default=2)
    a("--d_msg", type=int, default=None)
    a("--d_out", type=int, default=16)
    a("--bn", type=parse.str2bool, default=True)
    a("--dropout_features", type=float, default=0)
    a("--activation", type=str, default="relu")
    a("--train_eps", type=parse.str2bool, default=False)
    a("--aggr", type=str, default="add")
    a("--flow", type=str, default="source_to_target")
    a("--final_projection", type=parse.str2list2bool, default=[True])
    a("--jk_mlp", type=parse.str2bool, default=False)
    a("--residual", type=parse.str2bool, default=False)
    a("--readout", type=str, default="sum")
    a("--msg_kind", type=str, default="general")
    a("--inject_ids", type=parse.str2bool, default=False)
    a("--inject_degrees", type=parse.str2bool, default=False)
    a("--inject_edge_features", type=parse.str2bool, default=True)
    # optimization (main.py:638-657)
    a("--shuffle", type=parse.str2bool, default=True)
    a("--batch_size", type=int, default=16)
    a("--num_epochs", type=int, default=300)
    a("--num_iters", type=int, default=None)
    a("--num_iters_test", type=int, default=None)
    a("--eval_frequency", type=int, default=1)
    a("--lr", type=float, default=0.01)
    a("--regularization", type=float, default=0)
    a("--scheduler", type=str, default="StepLR")
    a("--scheduler_mode", type=str, default="min")
    a("--min_lr", type=float, default=0.0)
    a("--decay_steps", type=int, default=50)
    a("--decay_rate", type=float, default=0.5)
    a("--patience", type=int, default=20)
    a("--regression", type=parse.str2bool, default=False)
    a("--loss_fn", type=str, default="CrossEntropyLoss")
    a("--prediction_fn", type=str, default="multi_class_accuracy")
    # misc (main.py:660-676)
    a("--results_folder", type=str, default="temp")
    a("--checkpoint_file", type=str, default="checkpoint")
    a("--mode", type=str, default="train")
    a("--resume", type=parse.str2bool, default=False)
    a("--device_idx", type=int, default=0,
      help="reference main.py:668; selects among jax.devices() when >0")
    # experiment logging (reference main.py:669-672); the sink degrades
    # to JSONL when the wandb package is unavailable (train/logging.py)
    a("--wandb", type=parse.str2bool, default=True)
    a("--wandb_realtime", type=parse.str2bool, default=False)
    a("--wandb_project", type=str, default="gsn_project")
    a("--wandb_entity", type=str, default="anonymous")
    a("--isomorphism_eps", type=float, default=1e-2)
    a("--return_scores", action="store_true")
    a("--use_mxu", type=parse.str2bool, default=False,
      help="Pallas MXU aggregation layout (see PERFORMANCE.md)")
    a("--compute_dtype", type=str, default=None,
      choices=[None, "None", "bfloat16"],
      help="'bfloat16' = mixed-precision compute (bf16 matmuls + "
           "single-pass bf16 one-hot kernels, f32 master params/BN/"
           "Adam); measured 2.5x+ train throughput with --use_mxu True "
           "(PERFORMANCE.md)")
    a("--dropout_rng", type=str, default="threefry",
      choices=["threefry", "rbg"],
      help="'rbg' = hardware bit generator for node-level dropout "
           "masks (measured +16%% molhiv step throughput; same "
           "iid-bernoulli semantics, different stream)")
    a("--caps_mode", type=str, default="worst",
      choices=["worst", "tight"],
      help="batch padding caps: 'worst' compiles ONE shape for the whole "
           "run (best when dispatch/compile-bound, the common TPU case); "
           "'tight' re-buckets per epoch (less padding on skewed data)")
    a("--device", type=str, default="default",
      help="default | cpu (force CPU; the axon sitecustomize pins "
           "JAX_PLATFORMS=axon, so env vars alone don't stick)")
    # distributed execution over a device mesh (gsn_tpu.parallel.trainer):
    # the full training engine (scheduler/eval/checkpoint/folds/scanned
    # epochs) runs under shard_map; numerics match the single-device
    # trainer (tests/test_parallel_trainer.py)
    a("--parallel", type=str, default="none",
      choices=["none", "dp", "ep"],
      help="'dp' shards each batch's graphs across devices (cross-"
           "replica BN + global loss); 'ep' edge-partitions each batch "
           "across devices (node blocks local, senders exchanged per "
           "layer)")
    a("--parallel_devices", type=int, default=None,
      help="mesh size (default: all visible devices)")
    # multi-process / multi-host execution (gsn_tpu.parallel.distributed):
    # every participating process runs the same command with its own
    # --process_id; rank 0 owns checkpoint/log side effects.  See the
    # launch recipe in parallel/distributed.py.
    a("--coordinator_address", type=str, default=None,
      help="host:port of the jax.distributed coordinator; presence "
           "enables multi-process execution ('auto' on TPU pods lets "
           "the runtime discover the topology)")
    a("--num_procs_distributed", type=int, default=None,
      help="total process count of the jax.distributed cluster")
    a("--process_id", type=int, default=None,
      help="this process's rank in the jax.distributed cluster")
    return p


def _model_config(args: Dict, num_classes, in_features, in_edge_features,
                  d_in_node_encoder, d_in_edge_encoder, d_id,
                  d_degree) -> GSNConfig:
    return GSNConfig(
        model_name=args["model_name"],
        num_layers=args["num_layers"],
        d_out=args["d_out"],
        d_msg=args["d_msg"],
        d_h=args["d_h"],
        num_mlp_layers=args["num_mlp_layers"],
        out_features=num_classes,
        msg_kind=args["msg_kind"],
        id_scope=args["id_scope"],
        aggr=args["aggr"],
        flow=args["flow"],
        input_node_encoder=args["input_node_encoder"],
        d_out_node_encoder=args["d_out_node_encoder"],
        edge_encoder=args["edge_encoder"],
        d_out_edge_encoder=args["d_out_edge_encoder"],
        id_embedding=args["id_embedding"],
        d_out_id_embedding=args["d_out_id_embedding"],
        degree_embedding=args["degree_embedding"],
        d_out_degree_embedding=args["d_out_degree_embedding"],
        input_vn_encoder=args["input_vn_encoder"],
        d_out_vn_encoder=args["d_out_vn_encoder"],
        d_out_vn=args["d_out_vn"],
        multi_embedding_aggr=args["multi_embedding_aggr"],
        extend_dims=args["extend_dims"],
        features_scope=args["features_scope"],
        inject_ids=args["inject_ids"],
        inject_degrees=args["inject_degrees"],
        inject_edge_features=args["inject_edge_features"],
        degree_as_tag=args["degree_as_tag"],
        retain_features=args["retain_features"],
        random_features=args["random_features"],
        bn=args["bn"],
        bn_mlp=args["bn_mlp"],
        compute_dtype=(None if args.get("compute_dtype") in (None, "None")
                       else args["compute_dtype"]),
        dropout_rng=args.get("dropout_rng", "threefry"),
        activation_mlp=args["activation_mlp"],
        activation=args["activation"],
        final_projection=args["final_projection"],
        jk_mlp=args["jk_mlp"],
        dropout_features=args["dropout_features"],
        readout=args["readout"],
        train_eps=args["train_eps"],
        vn=args["vn"],
        vn_pooling=args["vn_pooling"],
        residual=args["residual"],
        in_features=in_features,
        in_edge_features=in_edge_features,
        d_in_node_encoder=d_in_node_encoder,
        d_in_edge_encoder=d_in_edge_encoder,
        d_in_id=d_id,
        d_degree=d_degree,
    )


def main(args: Dict):
    """Programmatic entry (mirrors reference main.main(args))."""
    import jax
    if args.get("device") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    multiproc = bool(args.get("coordinator_address")
                     or args.get("process_id") is not None)
    if multiproc:
        # join the jax.distributed cluster BEFORE any device use; all
        # jit computations then run as one SPMD program across every
        # process's devices (gsn_tpu/parallel/distributed.py)
        from .parallel import distributed as dist
        addr = args.get("coordinator_address")
        dist.initialize(
            None if addr in (None, "auto") else addr,
            args.get("num_procs_distributed"), args.get("process_id"),
            platform="cpu" if args.get("device") == "cpu" else None)
    if args.get("device_idx"):
        try:
            jax.config.update("jax_default_device",
                              jax.devices()[args["device_idx"]])
        except Exception:
            pass   # fewer devices than requested: reference falls back
            #        to CPU similarly (main.py:54-59)
    try:
        # persistent compile cache: repeat shapes (and repeat folds)
        # skip the multi-minute remote compiles
        os.makedirs("/root/repo/.jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    np.random.seed(args["np_seed"])

    path = os.path.join(args["root_folder"], args["dataset"],
                        args["dataset_name"])
    graphs, num_classes, orbit_sizes = prepare_dataset(
        path, args["dataset"], args["dataset_name"],
        id_scope=args["id_scope"], id_type=args["id_type"], k=args["k"],
        regression=args["regression"], induced=args["induced"],
        directed_orbits=args["directed_orbits"],
        custom_edge_list=args["custom_edge_list"],
        root_folder=args["root_folder"],
        num_processes=(args["num_processes"]
                       if args["multiprocessing"] else 1),
        cache_root=args.get("cache_folder"))

    # OGB simple feature scope (reference main.py:89-103)
    if args["dataset"] == "ogb" and args["features_scope"] == "simple":
        for g in graphs:
            g["x"] = g["x"][:, :2]
            g["edge_features"] = g["edge_features"][:, :2]

    in_features = graphs[0]["x"].shape[1] if graphs[0]["x"].ndim > 1 else 1
    has_ef = "edge_features" in graphs[0] and graphs[0]["edge_features"] \
        is not None
    in_edge_features = (graphs[0]["edge_features"].shape[1]
                        if has_ef and graphs[0]["edge_features"].ndim > 1
                        else (1 if has_ef else None))
    if args["dataset"] == "chemical" and args["dataset_name"] == "ZINC":
        d_in_node_encoder, d_in_edge_encoder = [28], [4]
    else:
        d_in_node_encoder = [in_features]
        d_in_edge_encoder = [in_edge_features]

    degree_encoding = (args["degree_encoding"]
                       if args["degree_as_tag"] else None)
    id_encoding = (args["id_encoding"]
                   if args["id_encoding"] != "None" else None)
    graphs, _enc_ids, d_id, _enc_deg, d_degree = encode(
        graphs, id_encoding, degree_encoding)

    cfg = _model_config(args, num_classes, in_features, in_edge_features,
                        d_in_node_encoder, d_in_edge_encoder, d_id,
                        d_degree)

    if args["mode"] == "isomorphism_test":
        pairs, fails, frac = run_isomorphism_test(
            graphs, cfg, seed=args["seed"],
            batch_size=args["batch_size"], eps=args["isomorphism_eps"])
        print(f"Total pairs: {pairs}")
        print(f"Number of non-isomorphic pairs that are not "
              f"distinguised: {fails}")
        print(f"Failure Percentage: {100 * frac:.2f}%")
        return {"failure_percentage": frac, "pairs": pairs, "fails": fails}

    tcfg = TrainerConfig(
        lr=args["lr"], regularization=args["regularization"],
        scheduler=args["scheduler"], decay_steps=args["decay_steps"],
        decay_rate=args["decay_rate"], patience=args["patience"],
        min_lr=args["min_lr"], batch_size=args["batch_size"],
        num_epochs=args["num_epochs"], num_iters=args["num_iters"],
        num_iters_test=args["num_iters_test"],
        eval_frequency=args["eval_frequency"], loss_fn=args["loss_fn"],
        prediction_fn=args["prediction_fn"],
        evaluator=("rocauc" if (args["dataset"] == "ogb" and
                                args["dataset_name"] != "ogbg-ppa")
                   else None),
        seed=args["seed"], shuffle=args["shuffle"],
        caps_mode=args.get("caps_mode", "worst"),
        use_mxu_segment_sum=args.get("use_mxu", False))

    fold_idxs = [-1] if args["onesplit"] else args["fold_idx"]
    perf_opt = np.argmin if args["regression"] else np.argmax

    results = []
    for fold in fold_idxs:
        if args["split"] == "given":
            train, test, val = separate_data_given_split(graphs, path, fold)
        else:
            train, test = separate_data(graphs, args["split_seed"], fold)
            val = None

        par = args.get("parallel", "none") or "none"
        if multiproc and par == "none":
            # a jax.distributed cluster without a parallel mode would
            # train N redundant copies; data parallelism is the natural
            # default (each process feeds its own devices' shards)
            print("[gsn_tpu] multi-process run: defaulting "
                  "--parallel to 'dp'")
            par = "dp"
        if par != "none":
            from .parallel.mesh import make_mesh
            from .parallel.trainer import ParallelTrainer
            if multiproc:
                from .parallel.distributed import global_mesh
                mesh = global_mesh(par)
            else:
                mesh = make_mesh(args.get("parallel_devices"),
                                 axis_names=(par,))
            trainer = ParallelTrainer(cfg, tcfg, train, mesh=mesh,
                                      mode=par, distributed=multiproc)
        else:
            trainer = Trainer(cfg, tcfg, train)
        example = next(iterate_batches(train, tcfg.batch_size))
        state = trainer.init_state(example, seed=args["seed"])

        ckpt_dir = os.path.join(
            args.get("cache_folder") or path, "results",
            args["results_folder"], str(fold), args["model_name"],
            "checkpoints")
        ckpt = os.path.join(ckpt_dir, args["checkpoint_file"] + ".pkl")
        ckpt_write = ckpt
        if multiproc:
            # rank-0-only WRITE side effects under multi-process
            # execution (every rank still reads checkpoints)
            from .parallel.distributed import is_coordinator
            if not is_coordinator():
                ckpt_write = None

        if args["mode"] == "test":
            state, _ = load_checkpoint(ckpt, state, trainer.scheduler)
            loss, acc = trainer.evaluate(state, test)
            print(f"Fold {fold}: test loss {loss:.4f}, metric {acc:.4f}")
            results.append({"test_loss": loss, "test_acc": acc})
            continue

        if args["resume"] and os.path.exists(ckpt):
            state, _ = load_checkpoint(ckpt, state, trainer.scheduler)

        # per-fold run logger (reference wandb realtime logging at
        # train_test_funcs.py:150-159; JSONL fallback without wandb);
        # rank-0-only under multi-process execution (ckpt_write doubles
        # as the rank-0 marker)
        logger = None
        if not multiproc or ckpt_write is not None:
            logger = RunLogger(
                run_dir=os.path.dirname(ckpt_dir),
                use_wandb=args.get("wandb", False),
                realtime=args.get("wandb_realtime", False),
                project=args.get("wandb_project", "gsn_project"),
                entity=args.get("wandb_entity", None),
                config=args)
        if logger is not None:
            logger.watch(state.params)   # reference wandb.watch, main.py:296
        state, hist = trainer.fit(state, train, test, graphs_val=val,
                                  checkpoint_file=ckpt_write,
                                  logger=logger)
        if hist["test_accs"] and logger is not None:
            fold_perf = perf_opt(hist["test_accs"])
            logger.set_summary(
                last_test_acc=hist["test_accs"][-1],
                best_test_acc=hist["test_accs"][int(fold_perf)],
                best_epoch=int(fold_perf) * args["eval_frequency"])
        if logger is not None:
            logger.close()
        results.append(hist)

    if args["mode"] == "test":
        return results

    # fold aggregation (reference main.py:376-498)
    agg = {}
    if results and results[0]["test_accs"]:
        accs = np.array([r["test_accs"] for r in results])  # [folds, evals]
        mean_curve = accs.mean(0)
        best_idx = int(perf_opt(mean_curve))
        agg = {
            "last_test_mean": float(accs[:, -1].mean()),
            "last_test_std": float(accs[:, -1].std()),
            "best_test_mean": float(mean_curve[best_idx]),
            "best_test_std": float(accs[:, best_idx].std()),
            "best_epoch": best_idx * args["eval_frequency"],
        }
        print(json.dumps(agg))
    if args.get("return_scores"):
        return agg
    return results


def cli():
    args = vars(build_parser().parse_args())
    main(args)


if __name__ == "__main__":
    cli()
