#!/bin/bash
# Shadow CPU build of the reference renderer (cg-tuwien/StatMC, mounted
# read-only at /root/reference) for PARITY-ARTIFACT GENERATION.
#
# The reference's ext submodules (openexr/glog/ptex/zlib/opencv) are
# empty in the mount and there is no network access, so this script
# copies the reference SOURCE into a scratch build dir and compiles it
# against the minimal stub headers in ./stubs:
#   - glog/logging.h      logging macro stubs
#   - opencv2/mini.hpp    shared-data Mat/Vec/GpuMat + PFM io; the CUDA
#                         stat_denoiser is a no-op, so the binary
#                         renders + writes RAW statistics buffers only
#                         (exactly what the parity fixtures need)
#   - Imf*.h              EXR API whose constructors throw (PFM output
#                         paths are unaffected)
#   - ptex_stub.cpp       loud-failure ptex Create functions
#   - pbrt/util/display.h no-op tev client
#
# The three albedo-LUT data files CMake normally downloads (uber/glass/
# translucent) are generated zero-filled: they feed only the albedo
# G-buffer feature of those materials, not radiance.
#
# Output: $BUILD_DIR/bin/pbrt-shadow
#
# Usage:  scripts/shadow_ref/build_shadow_ref.sh [BUILD_DIR]
# Then:   bin/pbrt-shadow --baseseed N --writeimages scene.pbrt
# (scene must set `"bool calcstats" ["true"] "string outputregex" [".*"]`
#  to emit the full t{X}-b{Y}-{n,mean,m2,m3,...} buffer set as PFMs.)
set -eu
HERE="$(cd "$(dirname "$0")" && pwd)"
REF=${REF:-/root/reference}
BUILD_DIR=${1:-/tmp/refbuild}

mkdir -p "$BUILD_DIR"
if [ ! -d "$BUILD_DIR/src" ]; then
  cp -r "$REF/src" "$BUILD_DIR/src"
  rm -rf "$BUILD_DIR/src/ext/pbrt-v4" "$BUILD_DIR/src/ext/opencv" \
         "$BUILD_DIR/src/ext/opencv_contrib" "$BUILD_DIR/src/display"
fi
cp -r "$HERE/stubs" "$BUILD_DIR/" 2>/dev/null || true

# Zero-filled stand-ins for the downloaded LUT data files.
python3 - "$BUILD_DIR" <<'EOF'
import sys, os
bd = sys.argv[1]
for name, nd in [("glass", 6), ("translucent", 6), ("uber", 8)]:
    path = f"{bd}/src/statistics/luts/{name}albedo.cpp"
    if os.path.exists(path):
        continue
    offs = []
    for k in range(2 ** nd):
        off = 0
        for d in range(nd):
            if (k >> (nd - 1 - d)) & 1:
                off += 8 ** (nd - 1 - d)
        offs.append(off)
    n = 8 ** nd
    with open(path, "w") as f:
        f.write(f'''// Zero-filled stand-in for the downloaded {name}albedo.cpp
#include "{name}albedo.h"
namespace pbrt {{
unsigned char {name}AlbedoLUTNDims = {nd};
unsigned char {name}AlbedoLUTMaxIndices[{nd}] = {{{", ".join(["7"]*nd)}}};
unsigned int  {name}AlbedoLUTOffsets[{2**nd}] = {{{", ".join(map(str, offs))}}};
Float {name}AlbedoLUT[{n}] = {{0.f}};
}}  // namespace pbrt
''')
EOF

cd "$BUILD_DIR"
mkdir -p obj bin
FLAGS='-O2 -std=c++17 -DNDEBUG -DPBRT_HAVE_ALLOCA_H -DPBRT_HAVE_MEMORY_H
 -DPBRT_HAVE_HEX_FP_CONSTANTS -DPBRT_HAVE_BINARY_CONSTANTS
 -DPBRT_HAVE_CONSTEXPR -DPBRT_CONSTEXPR=constexpr -DPBRT_HAVE_ALIGNAS
 -DPBRT_HAVE_ALIGNOF -DPBRT_HAVE_ITIMER -DPBRT_HAVE_NONPOD_IN_UNIONS
 -DPBRT_HAVE_MMAP -DPBRT_HAVE_POSIX_MEMALIGN -DPBRT_NOINLINE=
 -DPBRT_THREAD_LOCAL=thread_local -I src -I src/core -I stubs -w -pthread'
FLAGS=$(echo $FLAGS)

SRCS=$(ls src/core/*.cpp src/statistics/*.cpp src/statistics/luts/*.cpp \
  src/integrators/*.cpp src/shapes/*.cpp src/materials/*.cpp \
  src/textures/*.cpp src/lights/*.cpp src/samplers/*.cpp src/media/*.cpp \
  src/filters/*.cpp src/accelerators/*.cpp src/cameras/*.cpp \
  src/main/pbrt.cpp src/ext/lodepng.cpp src/ext/rply.cpp \
  src/ext/targa.cpp stubs/ptex_stub.cpp | grep -v "textures/ptex.cpp")

compile_one() {
  src=$1
  obj=obj/$(echo "$src" | tr '/' '_' | sed 's/\.cpp$/.o/')
  if [ "$obj" -nt "$src" ] 2>/dev/null; then return 0; fi
  g++ $FLAGS -c "$src" -o "$obj" 2> "obj/$(basename $obj).log" \
    || { echo "FAIL $src"; cat "obj/$(basename $obj).log" | head -5; }
}
export -f compile_one
export FLAGS
echo "$SRCS" | tr ' ' '\n' | xargs -P "$(nproc)" -I {} bash -c 'compile_one {}'
gcc -O2 -DNDEBUG -w -c src/ext/ArHosekSkyModel.c -o obj/ext_ArHosekSkyModel.o
g++ $FLAGS obj/*.o -o bin/pbrt-shadow -lpthread && echo "BUILT: $BUILD_DIR/bin/pbrt-shadow"
