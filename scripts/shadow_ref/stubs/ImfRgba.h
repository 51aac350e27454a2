#ifndef MINI_IMF_RGBA_H
#define MINI_IMF_RGBA_H

namespace Imf {
// "half" stands in as float: only used for in-memory staging in the
// (throwing) EXR paths of the shadow build.
struct Rgba {
    float r = 0, g = 0, b = 0, a = 1;
    Rgba() {}
    Rgba(float r, float g, float b, float a = 1) : r(r), g(g), b(b), a(a) {}
};
}  // namespace Imf

#endif
