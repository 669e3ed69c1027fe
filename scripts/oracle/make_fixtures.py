"""Generate reference-oracle fixtures for the parity suite (VERDICT r04 #1).

Builds the REFERENCE's CPU hierarchy-creator chain out-of-tree
(build_oracle.sh), feeds it a deterministic Gaussian cloud written through
THIS repo's ply writer, and commits the emitted artifacts (gzipped) under
tests/fixtures/oracle/:

  input.ply.gz          — the deterministic input cloud (our writer; the
                          reference Loader::loadPly<LessRichPoint> consumed
                          it, so the ply byte layout is itself oracled)
  hierarchy.dhier.gz    — the reference creator's own output
                          (mainHierarchyCreator.cpp: kd -> ClusterMerger ->
                          RotationAligner -> Writer::writeDynamicHierarchy)
  hierarchy.gdf.gz      — the reference creator's graph dump
  oracle.hier.gz        — reference HierarchyWriter::write, uncompressed
  oracle_c.hier.gz      — reference HierarchyWriter::write, f16-compressed
  oracle_arrays.bin.gz  — raw dump of the arrays handed to the writer
  manifest.json         — seed, counts, sha256 of every artifact

Run from the repo root: python scripts/oracle/make_fixtures.py
(only needed to REGENERATE fixtures; the test suite consumes the committed
files and never needs the oracle toolchain).
"""
import gzip
import hashlib
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import numpy as np

from hlod_gaussians_tpu.data.ply import GaussianPly, save_gaussian_ply

SEED = 20260820
N = 1024
ORACLE = "/tmp/hlod_oracle"
FIXDIR = os.path.join(REPO, "tests", "fixtures", "oracle")


def make_cloud(rng: np.random.Generator) -> GaussianPly:
    """Three blobs + a sparse shell: spread >> scale so the reference's
    merged opacity (weight_sum / merged surface, ClusterMerger.cpp:139 —
    which it never clamps) stays < 1 and our closed-form inflation
    (hierarchy/build.py::_merge_level) never triggers; the moment-parity
    tests assert this precondition on the oracle output."""
    centers = np.array([[0, 0, 4], [2.5, 1, 6], [-2, -1.5, 8]], np.float32)
    k = N // 4
    parts = [c + rng.normal(size=(k, 3)).astype(np.float32) * 0.8
             for c in centers]
    shell = rng.normal(size=(N - 3 * k, 3)).astype(np.float32)
    shell /= np.linalg.norm(shell, axis=-1, keepdims=True)
    parts.append(shell * 6.0 + np.array([0, 0, 6], np.float32))
    xyz = np.concatenate(parts).astype(np.float32)

    log_scale = (rng.normal(size=(N, 3)) * 0.3 - 2.5).astype(np.float32)
    quat = rng.normal(size=(N, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    opacity = rng.uniform(-2.0, 2.0, size=N).astype(np.float32)  # logits
    f_dc = rng.normal(size=(N, 1, 3)).astype(np.float32) * 0.5
    f_rest = rng.normal(size=(N, 3, 3)).astype(np.float32) * 0.05
    return GaussianPly(xyz=xyz, f_dc=f_dc, f_rest=f_rest, opacity=opacity,
                       log_scale=log_scale, quat=quat)


def gz(src: str, dst: str) -> str:
    with open(src, "rb") as f, gzip.GzipFile(dst, "wb", mtime=0) as g:
        shutil.copyfileobj(f, g)
    with open(src, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def main():
    subprocess.run(["bash", os.path.join(REPO, "scripts/oracle/build_oracle.sh")],
                   check=True)
    os.makedirs(FIXDIR, exist_ok=True)
    work = os.path.join(ORACLE, "work")
    os.makedirs(work, exist_ok=True)

    rng = np.random.default_rng(SEED)
    cloud = make_cloud(rng)
    ply = os.path.join(work, "input.ply")
    save_gaussian_ply(ply, cloud)

    # the reference's own creator main: argv = <ply> <source dir (unused
    # without the commented-out AppearanceFilter)> <outdir with trailing />
    subprocess.run([os.path.join(ORACLE, "creator"), ply, work, work + "/"],
                   check=True, stdout=subprocess.DEVNULL)
    # our fixture main: upstream .hier (un)compressed + raw array dump
    subprocess.run([os.path.join(ORACLE, "fixture_gen"), ply, work],
                   check=True)

    # ---- merger-falloff oracle (HierarchyExplicitLoader) ----------------
    # three overlapping chunk hierarchies whose gaussians straddle the
    # equidistance surfaces, written in the upstream .hier format through
    # our converter, then loaded by the REFERENCE's explicit loader
    # (getWeight falloff + weight-0 drop/splice + pos[0]-to-center)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from hlod_gaussians_tpu.data import dhier as dhier_io
    from hlod_gaussians_tpu.hierarchy import build as hb
    from hlod_gaussians_tpu.hierarchy.boxes import dhier_to_upstream

    centers = np.array([[0, 0, 5], [2, 0, 5], [0, 2, 5]], np.float32)
    merger_names = []
    for k, c in enumerate(centers):
        rng_k = np.random.default_rng(SEED + 100 + k)
        n = 256
        pts = (c + rng_k.normal(size=(n, 3)).astype(np.float32) * 1.2)
        scales = np.exp(rng_k.normal(size=(n, 3)) * 0.3 - 2.8) \
            .astype(np.float32)
        quats = rng_k.normal(size=(n, 4)).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
        ops = rng_k.uniform(0.1, 0.95, n).astype(np.float32)
        shs = rng_k.normal(size=(n, 1, 3)).astype(np.float32) * 0.4
        h = hb.build_hierarchy(pts, scales, quats, ops, shs)
        d = dhier_io.DHier(
            sh_degree=0, pos=h.pos, quat=h.quat,
            log_scale=np.log(np.maximum(h.scale, 1e-12)).astype(np.float32),
            opacity=np.clip(h.opacity, 1e-4, 2.0).astype(np.float32),
            shs=h.sh.astype(np.float32), nodes=h.nodes)
        cd = os.path.join(work, f"mchunk{k}")
        os.makedirs(cd, exist_ok=True)
        dhier_io.save_dhier(os.path.join(work, f"chunk{k}.dhier"), d)
        dhier_io.save_hier(os.path.join(cd, "chunk.hier"),
                           dhier_to_upstream(d), compressed=False)
        with open(os.path.join(cd, "center.txt"), "w") as f:
            f.write(f"{c[0]} {c[1]} {c[2]}\n")
        merger_names.append(f"chunk{k}.dhier")
    subprocess.run([os.path.join(ORACLE, "merger_probe"), work]
                   + [os.path.join(work, f"mchunk{k}")
                      for k in range(len(centers))], check=True)
    merger_names += [f"merged_chunk{k}.bin" for k in range(len(centers))]
    np.savetxt(os.path.join(work, "merger_centers.txt"), centers)
    merger_names.append("merger_centers.txt")

    # expandToTarget oracle over the creator hierarchy
    subprocess.run([os.path.join(ORACLE, "traversal_probe"),
                    os.path.join(work, "oracle.hier"),
                    os.path.join(work, "traversal.bin")], check=True)
    merger_names.append("traversal.bin")

    manifest = {"seed": SEED, "n_points": N, "sha256": {}}
    for name in ("input.ply", "hierarchy.dhier", "hierarchy.gdf",
                 "oracle.hier", "oracle_c.hier", "oracle_arrays.bin",
                 *merger_names):
        src = os.path.join(work, name)
        manifest["sha256"][name] = gz(src, os.path.join(FIXDIR, name + ".gz"))
        print(f"{name}: {os.path.getsize(src)} bytes")
    with open(os.path.join(FIXDIR, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print("fixtures written to", FIXDIR)


if __name__ == "__main__":
    main()
