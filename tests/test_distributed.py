"""Multi-process distributed runtime: 2 processes x 2 CPU devices each run
the DP + chunk-parallel steps over one process-spanning mesh
(scripts/multihost_dryrun.py). Replaces the reference's SLURM job-array
scale-out (scripts/full_train.py:79-236)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "multihost_dryrun.py")


def test_two_process_mesh(tmp_path):
    out_json = str(tmp_path / "mh.json")
    procs = []
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    for pid in range(2):
        args = [sys.executable, SCRIPT, str(pid), "2", "127.0.0.1:29555",
                "2", out_json if pid == 0 else "", "1"]
        procs.append(subprocess.Popen(
            args, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT))
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]
    result = json.load(open(out_json))
    assert result["ok"] and result["n_processes"] == 2
    assert result["n_data"] == 4
    assert result["chunk_parallel_ok"] and result["densify_ok"]
