// Shadow-build stand-in for textures/ptex.cpp (the Ptex submodule is
// absent): scenes using ptex textures fail loudly at parse time.
#include "textures/ptex.h"

#include "error.h"

namespace pbrt {

PtexTexture<Float> *CreatePtexFloatTexture(const Transform &,
                                           const TextureParams &) {
    Error("ptex textures are unsupported in the shadow CPU build");
    return nullptr;
}

PtexTexture<Spectrum> *CreatePtexSpectrumTexture(const Transform &,
                                                 const TextureParams &) {
    Error("ptex textures are unsupported in the shadow CPU build");
    return nullptr;
}

}  // namespace pbrt
