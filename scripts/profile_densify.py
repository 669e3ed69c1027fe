"""Profile the post_densify wall at pipeline scale (VERDICT r04 #3/#4:
densify was 1117 s of the 1682 s PIPELINE_r04 run — one ~280 s round per
chunk). Hypotheses to split:

  H1 cold XLA compile of the MCMC round (relocate_gs unrolls a 40-level
     promotion sweep at 2^21 capacity) through the remote compile service,
     re-triggered per chunk by shape changes (n_exposures differs per
     chunk);
  H2 rebuild_spt host cost (full-state D2H pulls over the tunnel + numpy
     level sweeps + forest re-upload);
  H3 genuine steady-state device cost.

Builds a ~500k-node hierarchy, wraps it at capacity 2^21, then times three
consecutive densify_round + rebuild_spt calls, then repeats densify_round
after an exposure-table shape change (the per-chunk recompile scenario).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    import jax
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0]) \
        if jax.tree_util.tree_leaves(out) else None
    dt = time.perf_counter() - t0
    print(f"{label:44s} {dt * 1e3:10.1f} ms", flush=True)
    return out


def main():
    import jax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np

    from hlod_gaussians_tpu.config import PostConfig
    from hlod_gaussians_tpu.data import dhier as dhier_io
    from hlod_gaussians_tpu.hierarchy import build as hb
    from hlod_gaussians_tpu.train import post as post_mod

    n_leaves = 250_000
    cap = 1 << 21
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(n_leaves, 3)).astype(np.float32) * 8.0
    pts[:, 2] += 25.0
    scales = np.exp(rng.normal(size=(n_leaves, 3)) * 0.3 - 3.0) \
        .astype(np.float32)
    quats = rng.normal(size=(n_leaves, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    ops = rng.uniform(0.05, 0.9, n_leaves).astype(np.float32)
    shs = rng.normal(size=(n_leaves, 1, 3)).astype(np.float32) * 0.3

    h = t("build_hierarchy (250k leaves)",
          lambda: hb.build_hierarchy(pts, scales, quats, ops, shs))
    d = dhier_io.DHier(
        sh_degree=0, pos=h.pos, quat=h.quat,
        log_scale=np.log(np.maximum(h.scale, 1e-12)).astype(np.float32),
        opacity=np.clip(h.opacity, 1e-4, 1 - 1e-6).astype(np.float32),
        shs=h.sh.astype(np.float32), nodes=h.nodes)
    print(f"nodes: {h.nodes.shape[0]}", flush=True)

    post = PostConfig()

    def make_ts(n_exposures):
        state = post_mod.create_from_dhier(
            d, cap, skybox_num=0, scene_radius=10.0,
            n_exposures=n_exposures)
        return post_mod.init_post_train(state)

    ts = t("create_from_dhier + init (cap 2^21)", lambda: make_ts(8))

    key = jax.random.PRNGKey(0)
    for i in range(3):
        key, sub = jax.random.split(key)
        ts, stats = t(f"densify_round #{i + 1}",
                      lambda: post_mod.densify_round(ts, sub, post=post))

    forests = []
    for i in range(3):
        # split rebuild into D2H pull + numpy sweep + device upload
        t0 = time.perf_counter()
        g = ts.gaussians
        alive = np.asarray(g.alive)
        nodes = np.asarray(g.nodes)
        xyz = np.asarray(g.xyz)
        ls = np.asarray(g.log_scale)
        pull = time.perf_counter() - t0
        print(f"  rebuild#{i + 1} D2H pulls {pull * 1e3:10.1f} ms",
              flush=True)
        forests.append(t(f"rebuild_spt #{i + 1} (total incl. pulls)",
                         lambda: post_mod.rebuild_spt(ts.gaussians,
                                                      post=post)))

    # per-chunk recompile scenario: exposure-table shape changes.
    # BEFORE the exposure-stripping fix in densify_round this was a full
    # ~60 s recompile; with the fix it must run at steady-state speed.
    ts2 = t("create_from_dhier (n_exposures=9)", lambda: make_ts(9))
    key, sub = jax.random.split(key)
    ts2, _ = t("densify_round after exposure-shape change",
               lambda: post_mod.densify_round(ts2, sub, post=post))
    key, sub = jax.random.split(key)
    ts2, _ = t("densify_round same shape again",
               lambda: post_mod.densify_round(ts2, sub, post=post))


if __name__ == "__main__":
    main()
