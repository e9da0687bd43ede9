#!/bin/bash
# Build + run the reference baseline harness on the bench scene.
# Usage: tools/ref_baseline/run.sh [workdir] (default /tmp/ref_bench)
set -e
REF=${REF:-/root/reference}
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
WORK=${1:-/tmp/ref_bench}
mkdir -p "$WORK"

python "$REPO/tools/ref_baseline/export_scene.py" --out "$WORK" --uavs 8

if [ ! -x "$WORK/ref_harness" ]; then
  g++ -O3 -fopenmp -std=c++14 -w \
    "$REPO/tools/ref_baseline/harness.cpp" \
    "$REF/HighOrderCCD/Utils/CCDUtils.cpp" \
    "$REF/HighOrderCCD/BVH/BVH.cpp" \
    "$REF/HighOrderCCD/BVH/src/AABB.cc" \
    -x c "$REF/lib/opengjk/src/openGJK.c" \
    -I"$REF" -I"$REF/lib/eigen3" -I"$REF/lib/opengjk/include" \
    -o "$WORK/ref_harness"
fi

cd "$WORK"
./ref_harness cross_synth 1 500   # decoupled (shipped default)
./ref_harness cross_synth 0 500   # coupled
