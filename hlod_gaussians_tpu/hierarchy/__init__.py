from hlod_gaussians_tpu.hierarchy.build import (  # noqa: F401
    PaddedHierarchy,
    build_hierarchy_padded,
    compact_hierarchy,
    build_hierarchy,
)
