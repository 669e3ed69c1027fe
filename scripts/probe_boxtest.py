"""How many dup entries would an EXACT ellipse-vs-tile-box test drop beyond
the circumscribed-circle test, on the bench scene and the LOD tree?"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np

    from bench_scene import make_bench_scene
    from hlod_gaussians_tpu.ops import gaussian_math
    from hlod_gaussians_tpu.ops.binning import bin_gaussians, tile_grid
    from hlod_gaussians_tpu.utils.camera import make_camera

    width, height = 1920, 1080
    TW = TH = 32
    p = make_bench_scene()
    cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=0.8,
                      width=width, height=height)
    focal_x = width / (2.0 * cam.tan_fovx)
    focal_y = height / (2.0 * cam.tan_fovy)

    params = {k: jnp.asarray(v) for k, v in p.items()}
    scales = jnp.exp(params["log_scale"])
    q = params["quat"] / jnp.linalg.norm(params["quat"], axis=-1,
                                         keepdims=True).clip(1e-12)
    op = jax.nn.sigmoid(params["opacity_logit"][..., 0])
    cov6 = gaussian_math.compute_cov3d(scales, q)
    proj = gaussian_math.project_gaussians(
        params["xyz"], cov6, op, cam.world_view, cam.full_proj,
        width, height, focal_x, focal_y, cam.tan_fovx, cam.tan_fovy)

    bins = bin_gaussians(proj.xy, proj.depth, proj.radius, proj.valid,
                         width, height, TW, TH, 1 << 20,
                         ext=proj.ext, reff2=proj.reff2)
    nd = int(bins.num_dup)
    print(f"circle-test entries: {nd}")

    # recompute the exact box test for every kept entry (host analysis)
    gid = np.asarray(bins.sorted_gid[:nd])
    tile = np.asarray(bins.sorted_tile[:nd])
    gw, gh = tile_grid(width, height, TW, TH)
    tx = (tile % gw).astype(np.float64)
    ty = (tile // gw).astype(np.float64)
    xy = np.asarray(proj.xy, np.float64)[gid]
    conic = np.asarray(proj.conic, np.float64)[gid]
    opg = np.asarray(proj.opacity, np.float64)[gid]
    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
    two_l = 2.0 * np.log(np.maximum(opg, 1e-12) * 255.0)

    x0 = np.maximum(tx * TW, 0)
    x1 = np.minimum(tx * TW + TW - 1, width - 1)
    y0 = np.maximum(ty * TH, 0)
    y1 = np.minimum(ty * TH + TH - 1, height - 1)
    dx0, dx1 = x0 - xy[:, 0], x1 - xy[:, 0]
    dy0, dy1 = y0 - xy[:, 1], y1 - xy[:, 1]

    def edge_x(xe):
        ys = np.clip(-b * xe / np.maximum(c, 1e-12), dy0, dy1)
        return a * xe * xe + 2 * b * xe * ys + c * ys * ys

    def edge_y(ye):
        xs = np.clip(-b * ye / np.maximum(a, 1e-12), dx0, dx1)
        return a * xs * xs + 2 * b * xs * ye + c * ye * ye

    qmin = np.minimum(np.minimum(edge_x(dx0), edge_x(dx1)),
                      np.minimum(edge_y(dy0), edge_y(dy1)))
    inside = (dx0 <= 0) & (0 <= dx1) & (dy0 <= 0) & (0 <= dy1)
    qmin = np.where(inside, 0.0, qmin)
    keep = qmin <= two_l
    print(f"exact-box-test entries: {int(keep.sum())} "
          f"({100 * (1 - keep.mean()):.1f}% dropped)")


if __name__ == "__main__":
    main()
