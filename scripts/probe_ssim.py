"""A/B: SSIM at 1080p — depthwise-conv blur vs shift-and-add blur,
forward and grad."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np

    from hlod_gaussians_tpu.ops import ssim as ssim_mod

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((3, 1080, 1920)).astype(np.float32))
    b = jnp.asarray(rng.random((3, 1080, 1920)).astype(np.float32))

    def timeit(name, fn, *args, iters=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        print(f"{name}: {(time.perf_counter() - t0) / iters * 1e3:7.2f} ms",
              flush=True)
        return out

    f_conv = jax.jit(ssim_mod.ssim)
    g_conv = jax.jit(jax.grad(lambda x: ssim_mod.ssim(x, b)))
    v0 = timeit("ssim conv fwd", f_conv, a, b)
    timeit("ssim conv grad", g_conv, a)

    # shift-and-add blur
    w = np.asarray(ssim_mod._gaussian_window_np(11, 1.5))

    def blur_sa(img):
        k = 11
        r = k // 2
        x = jnp.pad(img, ((0, 0), (r, r), (0, 0)))
        acc = None
        for i in range(k):
            t = w[i] * x[:, i:i + img.shape[1], :]
            acc = t if acc is None else acc + t
        x = jnp.pad(acc, ((0, 0), (0, 0), (r, r)))
        acc = None
        for i in range(k):
            t = w[i] * x[:, :, i:i + img.shape[2]]
            acc = t if acc is None else acc + t
        return acc

    def ssim_sa(img1, img2):
        mu1 = blur_sa(img1)
        mu2 = blur_sa(img2)
        mu1_sq = mu1 * mu1
        mu2_sq = mu2 * mu2
        mu1_mu2 = mu1 * mu2
        s1 = blur_sa(img1 * img1) - mu1_sq
        s2 = blur_sa(img2 * img2) - mu2_sq
        s12 = blur_sa(img1 * img2) - mu1_mu2
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        m = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
            (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
        return m.mean()

    f_sa = jax.jit(ssim_sa)
    g_sa = jax.jit(jax.grad(lambda x: ssim_sa(x, b)))
    v1 = timeit("ssim shift-add fwd", f_sa, a, b)
    timeit("ssim shift-add grad", g_sa, a)
    print(f"values: conv={float(v0):.6f} sa={float(v1):.6f} "
          f"diff={abs(float(v0) - float(v1)):.2e}")


if __name__ == "__main__":
    main()
