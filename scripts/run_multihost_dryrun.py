"""Launch the multi-process CPU dry run and record scaling efficiency.

All virtual devices share one physical CPU, so classic weak scaling is
meaningless here (N x the work on the same silicon). Instead both runs
process the SAME global batch of 8 views — baseline on 1 process x 1
device, multi on 2 processes x 4 devices — so efficiency = t_base/t_multi
measures the overhead the distributed program adds (collectives, Gloo
cross-process traffic, per-device dispatch). On real multi-host TPU the
same script measures true scaling. Writes MULTIHOST_r02.json.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "multihost_dryrun.py")


def run(nproc, ndev, port, out_json="", views_per_dev=1):
    procs = []
    for pid in range(nproc):
        args = [sys.executable, SCRIPT, str(pid), str(nproc),
                f"127.0.0.1:{port}", str(ndev), out_json if pid == 0 else "",
                str(views_per_dev)]
        procs.append(subprocess.Popen(
            args, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        if p.returncode != 0:
            print(o[-3000:])
            raise RuntimeError(f"proc failed rc={p.returncode}")
    return outs


def main():
    base_json = "/tmp/mh_base.json"
    multi_json = "/tmp/mh_multi.json"
    print("baseline 1 proc x 1 dev x 8 views ...", flush=True)
    run(1, 1, 29541, base_json, views_per_dev=8)
    print("multi 2 procs x 4 devs x 1 view ...", flush=True)
    run(2, 4, 29542, multi_json, views_per_dev=1)

    base = json.load(open(base_json))
    multi = json.load(open(multi_json))
    assert base["global_batch"] == multi["global_batch"], (base, multi)
    eff = base["dp_step_ms"] / multi["dp_step_ms"]
    result = dict(ok=True,
                  baseline=base, multi=multi,
                  equal_work_efficiency=round(eff, 3))
    out = os.path.join(REPO, "MULTIHOST_r02.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
