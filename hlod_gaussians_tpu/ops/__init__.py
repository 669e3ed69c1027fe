"""Compute ops: spherical harmonics, quaternions, projection, rasterization."""
