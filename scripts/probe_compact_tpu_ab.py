"""A/B the on-TPU pallas-vs-xla numerics with the ALIGNED binning layout
(round-3 path) to isolate whether probe_compact_tpu's diff magnitude is the
compact layout or pre-existing TPU precision spread."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from hlod_gaussians_tpu.ops import binning
    from hlod_gaussians_tpu.ops import rasterize as rast
    from hlod_gaussians_tpu.ops import rasterize_pallas as rp
    aligned_fn = binning.bin_gaussians_aligned

    def aligned(xy, depth, radius, valid, width, height, tile_w, tile_h,
                max_dup, ext=None, reff2=None, need_grads=True):
        return aligned_fn(xy, depth, radius, valid, width, height,
                          tile_w, tile_h, max_dup, rp.CHUNK,
                          ext=ext, reff2=reff2, need_grads=need_grads)

    # render.py re-imports the name from the binning module at call time;
    # rasterize.py bound it at import — patch both
    binning.bin_gaussians_compact = aligned
    rast.bin_gaussians_compact = aligned

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import probe_compact_tpu
    try:
        probe_compact_tpu.main()
    except AssertionError as e:
        print(f"ALIGNED-path assertion: {e}", flush=True)


if __name__ == "__main__":
    main()
