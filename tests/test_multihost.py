"""Multi-controller (multi-host) training tests.

Runs the REAL multi-process path — 2 separate Python processes, each with 2
virtual CPU devices, coordinated via jax.distributed + gloo collectives —
and checks:
  - the 4-device global GSPMD mesh trains end-to-end across the process
    (DCN-analogue) boundary;
  - artifact IO is host-0-only (parallel/multihost.py);
  - the result matches a single-process run on an identical 4-device mesh.

The reference has no distributed code at all (SURVEY.md §2.3); this is the
multi-host story (multi-controller, host-0 IO) of the TPU build.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

from elliptic_gnn_tpu.graph import build_graph

WORKER = r"""
import json, os, sys
# this environment's sitecustomize pre-registers a TPU plugin that the
# JAX_PLATFORMS env var cannot override (see tests/conftest.py) — force the
# CPU platform via config BEFORE any backend init
import jax
jax.config.update("jax_platforms", "cpu")
cfg = json.load(open(sys.argv[1]))
from elliptic_gnn_tpu.train import train_gnn
train_gnn.main(cfg)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def processed(tmp_path_factory):
    root = tmp_path_factory.mktemp("mhdata")
    build_graph.main({
        "seed": 0,
        "t_train_end": 10,
        "t_val_end": 13,
        "t_max": 16,
        "synthetic": True,
        "synthetic_nodes": 1536,
        "processed_dir": str(root / "processed"),
        "data_dir": str(root / "raw"),
    })
    return str(root / "processed")


def _cfg(processed, outroot, run_name):
    return {
        "run_name": run_name,
        "seed": 0,
        "processed_dir": processed,
        "output_root": outroot,
        "arch": "sage",
        "hidden_dim": 32,
        "layers": 2,
        "dropout": 0.0,
        "lr": 0.01,
        "weight_decay": 0.0,
        "max_epochs": 5,
        "patience": 10,
        "grad_clip": 1.0,
        "class_weight_pos": "auto",
        "use_val_for_thresholds": True,
        "precision_target": 0.0,
        "topk": 50,
        "calibrate_temperature": False,
        "mesh_devices": "all",
        "aggregation": "ell",
    }


def _launch(tmp_path, cfg, tag, n_proc, dev_per_proc, port=None):
    """Start n_proc worker processes; returns the Popen list."""
    script = tmp_path / f"worker_{tag}.py"
    script.write_text(WORKER)
    procs = []
    for pid in range(n_proc):
        cfg_path = tmp_path / f"cfg_{tag}_{pid}.json"
        c = dict(cfg)
        # each process gets its own output_root: non-primary must not write
        c["output_root"] = str(tmp_path / f"out_{tag}_p{pid}")
        cfg_path.write_text(json.dumps(c))
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={dev_per_proc}"
        )
        env.pop("EGNN_COORDINATOR", None)
        if n_proc > 1:
            env["EGNN_COORDINATOR"] = f"127.0.0.1:{port}"
            env["EGNN_NUM_PROCESSES"] = str(n_proc)
            env["EGNN_PROCESS_ID"] = str(pid)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, str(script), str(cfg_path)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    return procs


def _wait(procs, timeout=420):
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            raise AssertionError(f"worker timed out; output:\n{out[-4000:]}")
        outs.append(out)
    for p, out in zip(procs, outs):
        if p.returncode != 0 and "collectives" in out.lower():
            pytest.skip("jaxlib without CPU collectives (gloo) support")
        assert p.returncode == 0, f"worker rc={p.returncode}:\n{out[-4000:]}"
    return outs


def test_two_process_training_matches_single_process(tmp_path, processed):
    cfg = _cfg(processed, None, "mh")
    port = _free_port()

    # 2 processes x 2 devices = 4-device global mesh across a process boundary
    procs = _wait(_launch(tmp_path, cfg, "mh", n_proc=2, dev_per_proc=2,
                          port=port))
    # 1 process x 4 devices = the same 4-device mesh, no process boundary
    _wait(_launch(tmp_path, cfg, "sp", n_proc=1, dev_per_proc=4))

    mh_dir = tmp_path / "out_mh_p0" / "gnn" / "mh"
    sp_dir = tmp_path / "out_sp_p0" / "gnn" / "mh"
    mh = json.loads((mh_dir / "metrics.json").read_text())
    sp = json.loads((sp_dir / "metrics.json").read_text())

    # host-0-only IO: the non-primary process must write NOTHING
    assert not (tmp_path / "out_mh_p1").exists(), \
        "non-primary host wrote artifacts"
    for name in ("best.ckpt", "config_used.yaml", "training_log.csv",
                 "scores_test.npy"):
        assert (mh_dir / name).exists(), f"primary missing {name}"

    assert mh["n_test"] == sp["n_test"]
    # same global mesh, same math; gloo cross-process reductions may reorder
    # float sums, so allow reduction-level noise only
    assert abs(mh["best_val_pr_auc"] - sp["best_val_pr_auc"]) < 1e-5
    assert abs(mh["pr_auc_illicit"] - sp["pr_auc_illicit"]) < 1e-5
    del procs


def test_two_process_shardmap_halo_step(tmp_path, processed):
    """The explicit-collective boundary-halo path (aggregation: shard_map,
    parallel/shardmap_step.py) also runs across a REAL process boundary:
    2 processes x 2 devices, halo exchange + psum over gloo."""
    cfg = _cfg(processed, None, "mhsm")
    cfg.update(run_name="mhsm", arch="sage", aggregation="shard_map",
               max_epochs=3)
    port = _free_port()
    _wait(_launch(tmp_path, cfg, "mhsm", n_proc=2, dev_per_proc=2,
                  port=port))
    _wait(_launch(tmp_path, cfg, "spsm", n_proc=1, dev_per_proc=4))

    mh = json.loads((tmp_path / "out_mhsm_p0" / "gnn" / "mhsm" /
                     "metrics.json").read_text())
    sp = json.loads((tmp_path / "out_spsm_p0" / "gnn" / "mhsm" /
                     "metrics.json").read_text())
    assert not (tmp_path / "out_mhsm_p1").exists()
    assert abs(mh["best_val_pr_auc"] - sp["best_val_pr_auc"]) < 1e-5
    assert abs(mh["pr_auc_illicit"] - sp["pr_auc_illicit"]) < 1e-5
