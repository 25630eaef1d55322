#!/bin/bash
# Build the instrumented reference oracle.
#   tools/oracle/build.sh [BUILD_DIR]   (default /tmp/oracle_build)
# Copies /root/reference (never modified in place), applies the pd_dump
# instrumentation, and compiles the pt31-core sources + the headless
# driver with stubbed GL.  Produces BUILD_DIR/oracle.
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
REF=${REFERENCE:-/root/reference}
BUILD=${1:-/tmp/oracle_build}

mkdir -p "$BUILD"
rm -rf "$BUILD/ref"
mkdir -p "$BUILD/ref"
# copy only what the oracle build needs (no rsync in this image)
cp -r "$REF/src" "$BUILD/ref/src"
rm -rf "$BUILD/ref/src/imgui"
mkdir -p "$BUILD/ref/CGL"
cp -r "$REF/CGL/include" "$REF/CGL/src" "$BUILD/ref/CGL/"
python3 "$HERE/instrument.py" "$BUILD/ref"

SRC="$BUILD/ref/src"
CGL="$BUILD/ref/CGL"
CXX=${CXX:-g++}

$CXX -O2 -std=c++14 -w \
    -I"$SRC" -I"$CGL/include" -I"$CGL/include/CGL" -I"$HERE/gl_stubs" \
    -o "$BUILD/oracle" \
    "$HERE/oracle_main.cpp" \
    "$SRC/pathtracer/bidirection.cpp" \
    "$SRC/pathtracer/pathtracer.cpp" \
    "$SRC/pathtracer/bsdf.cpp" \
    "$SRC/pathtracer/advanced_bsdf.cpp" \
    "$SRC/pathtracer/sampler.cpp" \
    "$SRC/pathtracer/camera.cpp" \
    "$SRC/pathtracer/camera_lens.cpp" \
    "$SRC/scene/bvh.cpp" \
    "$SRC/scene/bbox.cpp" \
    "$SRC/scene/triangle.cpp" \
    "$SRC/scene/sphere.cpp" \
    "$SRC/scene/object.cpp" \
    "$SRC/scene/light.cpp" \
    "$SRC/scene/environment_light.cpp" \
    "$SRC/util/halfEdgeMesh.cpp" \
    "$SRC/util/sphere_drawing.cpp" \
    "$SRC/util/lodepng.cpp" \
    "$CGL/src/vector2D.cpp" \
    "$CGL/src/vector3D.cpp" \
    "$CGL/src/vector4D.cpp" \
    "$CGL/src/matrix3x3.cpp" \
    "$CGL/src/matrix4x4.cpp" \
    "$CGL/src/color.cpp"

echo "built $BUILD/oracle"
