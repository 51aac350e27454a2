// Stub OpenEXR API for the shadow CPU build: constructors throw, so the
// reference's existing try/catch reports "EXR unsupported" at runtime.
#ifndef MINI_IMF_RGBA_FILE_H
#define MINI_IMF_RGBA_FILE_H

#include <stdexcept>

#include "ImfRgba.h"

namespace Imath {
struct V2i {
    int x = 0, y = 0;
    V2i() {}
    V2i(int x, int y) : x(x), y(y) {}
};
struct Box2i {
    V2i min, max;
    Box2i() {}
    Box2i(V2i mn, V2i mx) : min(mn), max(mx) {}
};
}  // namespace Imath

namespace Imf {

enum RgbaChannels { WRITE_RGB = 0, WRITE_RGBA = 1 };

class RgbaInputFile {
  public:
    RgbaInputFile(const char *) {
        throw std::runtime_error("EXR unsupported in shadow build");
    }
    Imath::Box2i dataWindow() const { return {}; }
    Imath::Box2i displayWindow() const { return {}; }
    void setFrameBuffer(Rgba *, size_t, size_t) {}
    void readPixels(int, int) {}
};

class RgbaOutputFile {
  public:
    RgbaOutputFile(const char *, const Imath::Box2i &, const Imath::Box2i &,
                   RgbaChannels) {
        throw std::runtime_error("EXR unsupported in shadow build");
    }
    void setFrameBuffer(const Rgba *, size_t, size_t) {}
    void writePixels(int) {}
};

}  // namespace Imf

#endif
