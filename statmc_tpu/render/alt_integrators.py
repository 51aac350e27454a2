"""Dispatch for the non-statpath light-transport algorithms.

The reference keeps pbrt-v3's full integrator set functional
(/root/reference/src/integrators/: bdpt.cpp, mlt.cpp, sppm.cpp).  These
are distinct transport algorithms -- bidirectional connection, Markov
chain mutation over primary-sample space, and progressive photon
mapping -- and must NOT be silently aliased onto unidirectional path
tracing (they produce different images on the scenes they exist for:
caustics, difficult visibility).

Wavefront TPU drivers live in sibling modules:
  * render/bdpt.py    -- bidirectional path tracer (bdpt.cpp:1)
  * render/sppm.py    -- stochastic progressive photon mapping (sppm.cpp:1)
  * render/pssmlt.py  -- primary-sample-space MLT over many parallel
                         chains (mlt.cpp:1; pbrt's MLT is already PSS)
"""
from __future__ import annotations


def make_alt_renderer(name: str, desc, base_seed: int = 0,
                      force_dense: bool = False):
    try:
        if name == "bdpt":
            from .bdpt import BDPTRenderer

            return BDPTRenderer(desc, base_seed, force_dense=force_dense)
        if name == "sppm":
            from .sppm import SPPMRenderer

            return SPPMRenderer(desc, base_seed, force_dense=force_dense)
        if name == "mlt":
            from .pssmlt import MLTRenderer

            return MLTRenderer(desc, base_seed, force_dense=force_dense)
    except ImportError as e:
        raise NotImplementedError(
            f"integrator {name!r}: wavefront driver not built yet; "
            "refusing to silently alias onto unidirectional path tracing "
            f"(would render a different image). [{e}]"
        ) from e
    raise ValueError(f"unknown alternative integrator {name!r}")
