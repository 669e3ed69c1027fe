#!/bin/bash
# Build the REFERENCE's CPU hierarchy-creator chain OUT-OF-TREE as a parity
# oracle (VERDICT r04 #1). Nothing from /root/reference is vendored into
# this repo: the reference sources are compiled in /tmp against the Eigen
# headers shipped inside the tensorflow wheel (the reference's vendored
# eigen submodule dir is empty) and the reference's own vendored glm.
#
# Produces:
#   /tmp/hlod_oracle/creator      — the reference's own GaussianHierarchyCreator
#                                   main (kd-tree -> ClusterMerger ->
#                                   RotationAligner -> .dhier + .gdf)
#   /tmp/hlod_oracle/fixture_gen  — our fixture main (same build chain, plus
#                                   .hier uncompressed/compressed via the
#                                   reference HierarchyWriter + raw array dump)
set -euo pipefail

REF=/root/reference/submodules/gaussianhierarchy
EIG=/opt/venv/lib/python3.12/site-packages/tensorflow/include
OUT=/tmp/hlod_oracle
HERE="$(cd "$(dirname "$0")" && pwd)"

mkdir -p "$OUT"

COMMON_SRCS="$REF/loader.cpp $REF/writer.cpp $REF/hierarchy_writer.cpp \
  $REF/PointbasedKdTreeGenerator.cpp $REF/ClusterMerger.cpp \
  $REF/rotation_aligner.cpp"
FLAGS="-O2 -std=c++17 -I$REF -I$EIG -I$REF/dependencies/glm"

g++ $FLAGS -o "$OUT/creator" "$REF/mainHierarchyCreator.cpp" $COMMON_SRCS
g++ $FLAGS -o "$OUT/fixture_gen" "$HERE/fixture_main.cpp" $COMMON_SRCS
g++ $FLAGS -o "$OUT/merger_probe" "$HERE/merger_probe.cpp" \
  $REF/hierarchy_explicit_loader.cpp $REF/hierarchy_loader.cpp
g++ $FLAGS -o "$OUT/traversal_probe" "$HERE/traversal_probe.cpp" \
  $REF/traversal.cpp $REF/hierarchy_loader.cpp

echo "oracle built: $OUT/creator $OUT/fixture_gen $OUT/merger_probe"
