"""Multi-host SPMD: two real train.py processes (jax.distributed + gloo
over a 2x4-device CPU cluster) must train to the SAME parameters as one
process with 8 devices — proving per-host data sharding (each host feeds
only its own batch rows, parallel/mesh.py::shard_batch), replicated eval
outputs, and process-0-only checkpointing."""

import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow

ARGS = [
    "--trainer", "CoOp",
    "--seed", "1",
    "--dataset-config-file", "configs/datasets/synthetic.yaml",
    "--config-file", "configs/trainers/tests/synthetic_tiny.yaml",
]
OPTS = ["OPTIM.MAX_EPOCH", "2", "TRAIN.CHECKPOINT_FREQ", "0"]


def free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def run_proc(out_dir, n_local_devices, extra_env, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["FSVLM_INIT_TIMEOUT"] = "600"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local_devices}"
    env.update(extra_env)
    return subprocess.Popen(
        [sys.executable, os.path.join(ROOT, "train.py")] + ARGS
        + ["--output-dir", out_dir] + OPTS,
        env=env,
        cwd=ROOT,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


def load_ckpt_params(out_dir):
    path = os.path.join(out_dir, "prompt_learner", "model.pkl-2")
    assert os.path.exists(path), os.listdir(out_dir)
    with open(path, "rb") as f:
        ckpt = pickle.load(f)
    return ckpt["state_dict"]


def test_two_process_matches_single_process(tmp_path):
    """No retry: flake-proofed instead by a 600s gloo rendezvous timeout
    (FSVLM_INIT_TIMEOUT, train.py) — the old failure mode was the default
    300s rendezvous expiring while concurrent XLA compiles saturated this
    2-core host — plus generous subprocess timeouts."""
    _run_two_process_case(tmp_path / "a")


def _run_two_process_case(tmp_path):
    os.makedirs(tmp_path, exist_ok=True)
    single_dir = str(tmp_path / "single")
    proc = run_proc(single_dir, 8, {})
    out, _ = proc.communicate(timeout=1500)
    assert proc.returncode == 0, out[-3000:]

    multi_dir = str(tmp_path / "multi")
    port = free_port()
    procs = []
    for pid in range(2):
        procs.append(
            run_proc(
                multi_dir, 4,
                {
                    "FSVLM_MULTIHOST": "1",
                    "FSVLM_COORDINATOR": f"localhost:{port}",
                    "FSVLM_NUM_PROCESSES": "2",
                    "FSVLM_PROCESS_ID": str(pid),
                },
            )
        )
    outs = [p.communicate(timeout=1500)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]

    # process 0 wrote the checkpoint; process 1 did not race it
    # (single writer per shared output dir)
    p_single = load_ckpt_params(single_dir)
    p_multi = load_ckpt_params(multi_dir)
    flat_s = {k: np.asarray(v) for k, v in p_single.items()}
    flat_m = {k: np.asarray(v) for k, v in p_multi.items()}
    assert flat_s.keys() == flat_m.keys()
    for k in flat_s:
        np.testing.assert_allclose(
            flat_s[k], flat_m[k], rtol=0, atol=1e-5,
            err_msg=f"param {k} diverged between 1-proc and 2-proc runs",
        )

    # both processes evaluated to the same accuracy line
    acc = [l for o in outs for l in o.splitlines() if "* accuracy:" in l]
    assert len(acc) >= 2 and len(set(acc)) == 1, acc
